"""chess_vision_tpu.train"""

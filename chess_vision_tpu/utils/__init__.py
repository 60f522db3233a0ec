"""chess_vision_tpu.utils"""

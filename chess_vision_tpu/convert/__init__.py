"""chess_vision_tpu.convert"""

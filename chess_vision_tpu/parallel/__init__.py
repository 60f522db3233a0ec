"""chess_vision_tpu.parallel"""

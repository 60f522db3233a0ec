"""chess_vision_tpu.ops"""

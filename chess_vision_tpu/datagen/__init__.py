"""chess_vision_tpu.datagen"""

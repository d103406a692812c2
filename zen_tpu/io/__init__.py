"""zen_tpu.io"""

"""zen_tpu.ops"""

"""zen_tpu.engine"""

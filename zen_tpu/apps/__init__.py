"""zen_tpu.apps"""

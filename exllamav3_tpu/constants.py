# KV cache page size in tokens (matches the reference format:
# /root/reference/exllamav3/constants.py:3)
PAGE_SIZE = 256

# Cap on quantized MLP intermediate slice width (reference constants.py:5)
MAX_MLP_INTERMEDIATE = 55296

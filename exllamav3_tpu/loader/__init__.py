from .safetensors import SafetensorsCollection, VariantSafetensorsCollection, save_file

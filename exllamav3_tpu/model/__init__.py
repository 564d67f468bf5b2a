from .config import Config, InferParams, NullConfig, no_default
from .model import Model
from .cache import Cache, CacheSpec

from .generator import Generator
from .job import Job
from .async_generator import AsyncGenerator, AsyncJob
from .sampler import (
    Sampler,
    GreedySampler,
    ArgmaxSampler,
    DefaultSampler,
    TopKSampler,
    TopPSampler,
    CustomSampler,
    AdaptivePSampler,
)

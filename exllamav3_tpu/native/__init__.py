"""Native host library (C++): threaded loader, suffix automaton, Viterbi.

Built on demand with g++; falls back gracefully when unavailable (pure-
Python/jnp equivalents exist for every function).
"""
from .build import get_lib, native_available

from .compilation_cache import enable_persistent_compilation_cache
from .rng import make_random_state, rng_to_jax_key

__all__ = [
    "enable_persistent_compilation_cache",
    "make_random_state",
    "rng_to_jax_key",
]

from .rng import make_random_state, rng_to_jax_key

__all__ = ["make_random_state", "rng_to_jax_key"]

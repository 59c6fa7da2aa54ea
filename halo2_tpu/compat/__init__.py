from . import bn254_pairing

__all__ = ["bn254_pairing"]

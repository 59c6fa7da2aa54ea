from .ntt import NTT, get_ntt, powers, bit_reverse_indices

__all__ = ["NTT", "get_ntt", "powers", "bit_reverse_indices"]

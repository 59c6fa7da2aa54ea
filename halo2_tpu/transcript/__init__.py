from .transcript import (
    Blake2bWrite, Blake2bRead, Keccak256Write, Keccak256Read,
)
from .keccak import Keccak256

__all__ = [
    "Blake2bWrite", "Blake2bRead", "Keccak256Write", "Keccak256Read",
    "Keccak256",
]

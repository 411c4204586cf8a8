from .mps import read_mps, parse_mps

__all__ = ["read_mps", "parse_mps"]

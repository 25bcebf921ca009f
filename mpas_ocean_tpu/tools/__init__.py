from .cases import make_igw_case

__all__ = ["make_igw_case"]

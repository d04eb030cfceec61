from .raw import RawSpace
from .sq import SQSpace

__all__ = ["RawSpace", "SQSpace"]

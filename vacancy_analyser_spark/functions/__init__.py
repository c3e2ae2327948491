from .numeric import davg, dsum
from .text import cut_text, normalize_ws, tokens

__all__ = ["davg", "dsum", "cut_text", "normalize_ws", "tokens"]

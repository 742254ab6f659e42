from .ast import Node, Op, MAX_RUNE
from .parser import (FOLD, MULTILINE, DOT_NL, UNGREEDY, ParseError, Parsed,
                     parse)

__all__ = ["Node", "Op", "MAX_RUNE", "FOLD", "MULTILINE", "DOT_NL",
           "UNGREEDY", "ParseError", "Parsed", "parse"]

from .text import tokens_col, segments_col, ngrams_col, doclen_col  # noqa: F401

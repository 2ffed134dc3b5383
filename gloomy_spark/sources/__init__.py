from .text import read_plaintext_docs, read_wholefile_docs  # noqa: F401
from .vertical import read_vertical_docs  # noqa: F401

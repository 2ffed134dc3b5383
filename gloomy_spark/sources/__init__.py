from .pages import pages_to_docs, read_pages  # noqa: F401
from .text import read_plaintext_docs, read_wholefile_docs  # noqa: F401
from .vertical import read_vertical_docs, read_vertical_structs  # noqa: F401

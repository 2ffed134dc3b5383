from .regexparser import RegexPrefixError, regex_to_prefixes  # noqa: F401

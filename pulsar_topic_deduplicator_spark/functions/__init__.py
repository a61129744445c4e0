from .canonical import canonical_json, canonical_props, filter_ignored_keys
from .hashing import SEP, content_hash, events_digest, hash64, stable_uint60
from .text import shingles, whitespace_tokens
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "SEP",
    "canonical_json",
    "canonical_props",
    "content_hash",
    "cosine_similarity",
    "dot",
    "events_digest",
    "filter_ignored_keys",
    "hash64",
    "l2_norm",
    "shingles",
    "stable_uint60",
    "whitespace_tokens",
]

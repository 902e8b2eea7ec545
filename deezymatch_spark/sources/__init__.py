"""Sources: synthetic pages (input_hint schema), TSV pair/query readers."""

from .pages import extract_anchor_texts, extract_title, generate_pages
from .tsv import label_to_bool, read_pairs_tsv, read_queries_tsv, valid_label

__all__ = [
    "extract_anchor_texts", "extract_title", "generate_pages",
    "label_to_bool", "read_pairs_tsv", "read_queries_tsv", "valid_label",
]

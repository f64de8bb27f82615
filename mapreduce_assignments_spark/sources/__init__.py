from .tables import load_table, load_tables
from .text_corpus import read_adjacency_text, read_text_corpus, read_tweets_tsv

__all__ = [
    "load_table",
    "load_tables",
    "read_text_corpus",
    "read_adjacency_text",
    "read_tweets_tsv",
]

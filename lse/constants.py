"""Engine constants.

Parity source: /root/reference/src/main/java/com/localengine/config/Constants.java
and /root/reference/src/main/java/com/localengine/text/StopWords.java:7-14.
"""

# BM25 parameters (Constants.java:35-37)
BM25_K1 = 1.2
BM25_B = 0.75

# Posting-block interval: one block-max metadata entry per this many docs
# (Constants.java:25 SKIP_INTERVAL — the reference's skip list becomes our
# block-max WAND block boundary).
BLOCK_INTERVAL = 128

# Query guards (Constants.java:59-61)
MAX_QUERY_LENGTH = 2048
MAX_SEARCH_LIMIT = 1000

# Snippets (Constants.java:40-43)
SNIPPET_CONTEXT_CHARS = 80
MAX_SNIPPETS = 3

# The reference's 49-word English stopword set (StopWords.java:7-14).
STOPWORDS = frozenset(
    {
        "the", "a", "an", "is", "are", "was", "were", "be", "been",
        "has", "have", "had", "do", "does", "did", "will", "would",
        "could", "should", "may", "might", "can", "and", "or", "but",
        "not", "in", "on", "at", "to", "for", "of", "with", "by",
        "from", "as", "into", "it", "its", "this", "that", "which",
        "if", "so", "no", "up", "out", "all", "just", "also", "very",
    }
)

# Fields accepted by the query DSL (QueryParser.java:8). `lang` is this
# engine's extension: the source-code corpus carries `lang` where the
# reference carried a file extension, so `ext:` and `lang:` are synonyms.
SUPPORTED_FIELDS = frozenset(
    {"path", "ext", "lang", "size", "mtime", "type", "filename", "name", "repo"}
)

# DocType taxonomy (document/DocType.java:3-10) keyed by lang/extension
# (document/Document.java:60-77 infers type from extension sets).
LANG_TO_DOCTYPE = {
    "java": "CODE", "py": "CODE", "js": "CODE", "ts": "CODE", "go": "CODE",
    "rs": "CODE", "c": "CODE", "cpp": "CODE", "h": "CODE", "scala": "CODE",
    "md": "NOTE", "markdown": "NOTE",
    "txt": "DOC", "rst": "DOC", "adoc": "DOC",
    "json": "DATA", "csv": "DATA", "xml": "DATA",
    "yaml": "CONFIG", "yml": "CONFIG", "toml": "CONFIG", "ini": "CONFIG",
    "properties": "CONFIG",
}
DEFAULT_DOCTYPE = "OTHER"

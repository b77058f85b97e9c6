from semantic_search_system_ray.functions.text import (  # noqa: F401
    clean_text_ingest,
    clean_text_topic,
    clean_text_chat,
    normalize_key,
    normalize_date,
    tokenize,
    sentence_split,
    arrow_clean_text_ingest,
    arrow_clean_text_topic,
    arrow_normalize_key,
)
from semantic_search_system_ray.functions.scores import (  # noqa: F401
    normalize_scores_to_100,
    arrow_minmax_normalize_100,
)
from semantic_search_system_ray.functions.embed import (  # noqa: F401
    hash_embed,
    hash_embed_many,
)
from semantic_search_system_ray.functions.hashing import (  # noqa: F401
    stable_hash64,
    content_doc_id,
    minhash_signature,
    simhash64,
    char_ngrams,
    word_shingles,
)

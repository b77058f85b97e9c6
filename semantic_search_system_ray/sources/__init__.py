from semantic_search_system_ray.sources.documents import (  # noqa: F401
    read_documents,
    write_documents,
    text_table_to_spans,
)
from semantic_search_system_ray.sources.synth import (  # noqa: F401
    SynthCorpus,
    generate_corpus,
)

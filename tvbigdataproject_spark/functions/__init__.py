from tvbigdataproject_spark.functions.core import (  # noqa: F401
    array_to_string,
    cnt_distinct_elems,
    cnt_intersection,
    jaccard,
    normalize_tags,
)
from tvbigdataproject_spark.functions.text import (  # noqa: F401
    char_ngrams,
    shingles,
    simple_clean,
    tokens,
    word_shingles,
)
from tvbigdataproject_spark.functions.hashing import (  # noqa: F401
    hex16_hash,
    hex_bits_hash,
    lsh_bands,
    md5_seeded,
    minhash_signature,
)
from tvbigdataproject_spark.functions.text import simple_tokens  # noqa: F401
from tvbigdataproject_spark.functions.vectors import (  # noqa: F401
    cosine_arrow,
    cosine_similarity,
    dot_product,
    l2_norm,
)

from doppel_spark.functions.digests import full_digest, quick_digest  # noqa: F401
from doppel_spark.functions.extract import (  # noqa: F401
    extract_pages, extracted_text, extraction_matches,
    assert_extraction_identity, split_extraction)
from doppel_spark.functions.normalize import (  # noqa: F401
    strip_control_chars, unicode_normalize)

"""gaia_ref — single-node reference oracle for the GAIA-style KG pipeline.

This package is the *reference extractor* demanded by BASELINE.json's
per-row invariant ("byte-identical extracted text per url vs the
reference extractor").  The true GAIA implementations live in external
Docker images that are not vendored into /root/reference
(/root/reference/README.md:22-23), so this dependency-free, deterministic
single-node re-implementation of the text pipeline (SURVEY.md §5.2.1)
is the oracle the distributed Spark pipeline is scored against:

- ``extract.py``   — T1 html→text + sentence/token segmentation
                     (ltf/rsd analog, /root/reference/README.md:44)
- ``gazetteer.py`` — the mention/trigger lexicons shared with the Spark
                     tagger (ELMo-LSTM-CRF analog, deterministic)
- ``oracle.py``    — golden mentions/relations/events/triples, i.e. the
                     Cold-Start `.cs` assertion surface
                     (/root/reference/README.md:46-49)

The Spark pipeline (gaia_spark/) wraps the *same* pure functions in
Arrow-batched pandas UDFs, which is what makes byte-identity achievable
and meaningful: the invariant verifies that distribution (Arrow
transfer, partitioning, retries) never perturbs a single byte.
"""

from gaia_ref.extract import extract_text, split_sentences, tokenize  # noqa: F401

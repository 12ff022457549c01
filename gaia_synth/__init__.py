"""gaia_synth — deterministic Common-Crawl-style corpus generator (M0).

Produces the `pages` table in exactly the BASELINE.json input_hint shape
(url, warc_ts, html, text, lang) plus the broadcastable background-KB
tables, with the properties SURVEY.md §7 M0 demands: Zipf-skewed domains
(salting exercise), near-duplicate pages (LSH exercise), alias variation
(linking exercise), adversarial HTML (byte-identity exercise),
multi-lingual routing (en/ru/uk/es/de, /root/reference/README.md:47-49).
"""

from gaia_synth.corpus import gen_pages, write_corpus  # noqa: F401

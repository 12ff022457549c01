"""Oracle pipeline unit tests: tagging, coref, relations, events, NIL."""

from gaia_ref.extract import extract_text
from gaia_ref.oracle import (
    extract_doc_assertions,
    is_heldout,
    link_mention,
    nil_cluster_ids,
    run_oracle,
)
from gaia_ref.tagging import tag_document
from gaia_synth import gen_pages


def test_tagging_simple():
    ms, tr = tag_document("Viktor Orlov visited Kyiv .")
    assert [(m.surface, m.coarse) for m in ms] == [
        ("Viktor Orlov", "PER"), ("Kyiv", "GPE")]
    assert tr == []


def test_tagging_longest_match_and_abbrev():
    ms, _ = tag_document("I.B.M. acquired Danube Steel Works .")
    assert [(m.surface, m.coarse) for m in ms] == [
        ("I.B.M", "ORG"), ("Danube Steel Works", "ORG")]


def test_ambiguous_alias_resolves_by_popularity():
    ms, _ = tag_document("Columbia is based in Kyiv .")
    # Q2013 Columbia University (pop 8.7) beats Q3011 the city (5.0)
    assert ms[0].coarse == "ORG"
    assert link_mention("ORG", "Columbia") == "Q2013"


def test_trigger_detection():
    _, tr = tag_document("Kyiv arrested Orlov at dawn .")
    assert len(tr) == 1 and tr[0].fine_event == "Justice.Arrest"


def test_relation_simple():
    rels, evts = extract_doc_assertions("Elena Petrova visited Berlin .")
    assert len(rels) == 1 and evts == []
    r = rels[0]
    assert (r["subj_m"].surface, r["pred"], r["obj_m"].surface) == (
        "Elena Petrova", "Physical.Visited", "Berlin")


def test_appositive_propagation():
    rels, _ = extract_doc_assertions(
        "Viktor Orlov , head of Helios Energy , visited Warsaw .")
    got = {(r["subj_m"].surface, r["pred"], r["obj_m"].surface) for r in rels}
    assert got == {
        ("Viktor Orlov", "PersonalSocial.LeaderOf", "Helios Energy"),
        ("Viktor Orlov", "Physical.Visited", "Warsaw"),
    }


def test_event_args_nearest():
    rels, evts = extract_doc_assertions("Kyiv elected Greta Haas on Sunday .")
    assert rels == []
    assert len(evts) == 1
    e = evts[0]
    assert (e["subj_m"].surface, e["pred"], e["obj_m"].surface) == (
        "Kyiv", "evt:Personnel.Elect", "Greta Haas")


def test_nominal_coref_feeds_relations():
    text = extract_text(
        b"<p>Helios Energy is based in Berlin .</p>"
        b"<p>The company opened an office in Madrid .</p>")
    rels, _ = extract_doc_assertions(text)
    got = {(r["subj_m"].surface, r["pred"], r["obj_m"].surface) for r in rels}
    assert ("Helios Energy", "GeneralAffiliation.BasedIn", "Madrid") in got


def test_nil_variants_cluster_together():
    ids = nil_cluster_ids({
        ("PER", "zorian balaban"), ("PER", "balaban"),
        ("ORG", "kestrel logistics"), ("ORG", "kestrel")})
    assert ids[("PER", "zorian balaban")] == ids[("PER", "balaban")]
    assert ids[("ORG", "kestrel logistics")] == ids[("ORG", "kestrel")]
    # type mismatch never merges
    assert ids[("PER", "balaban")] != ids[("ORG", "kestrel")]


def test_oracle_end_to_end_deterministic():
    pages = gen_pages(60)
    a = run_oracle(pages)
    b = run_oracle(gen_pages(60))
    assert a["texts"] == b["texts"]
    assert a["triples"] == b["triples"]
    assert len(a["triples"]) > 50
    # canonical ids only: every subj/obj is a Q-id or NIL cluster
    for t in a["triples"]:
        assert t["subj"].startswith(("Q", "NIL:"))
        assert t["obj"].startswith(("Q", "NIL:"))


def test_heldout_split_fraction():
    urls = [p["url"] for p in gen_pages(500)]
    frac = sum(is_heldout(u) for u in urls) / len(urls)
    assert 0.12 < frac < 0.28


def test_generator_near_duplicates():
    pages = gen_pages(40)
    from gaia_synth.corpus import page_sentences
    orig = set(page_sentences(18))
    dup_html = pages[19]["html"].decode()
    # near-dup page 19 reuses page 18's sentences (a couple may be
    # perturbed by the token edit or the &amp; html decoration)
    assert sum(s in dup_html for s in orig) >= 0.6 * len(orig)

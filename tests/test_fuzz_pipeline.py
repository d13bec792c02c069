"""Hostile-input fuzzing: arbitrary JSON embedded in a page must always
produce either triples or a flagged status — never an unhandled exception
(at corpus scale one poison page must not kill an executor task)."""

import json

from hypothesis import given, settings, strategies as st

from racket_linkeddata_spark.core.pipeline import page_to_triples

json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(min_value=-10**12, max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
    st.sampled_from(["@id", "@type", "@list", "@value", "@context",
                     "http://ex.org/x", "_:b0", "ex:y", "@vocab", "@graph"]),
)

json_trees = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(
            st.one_of(st.text(max_size=10),
                      st.sampled_from(["@id", "@type", "@value", "@language",
                                       "@list", "@set", "@context", "@graph",
                                       "@reverse", "@index", "@vocab",
                                       "@base", "name", "ex:p"])),
            children, max_size=5)),
    max_leaves=25,
)


@settings(max_examples=250, deadline=None)
@given(json_trees)
def test_page_never_raises(doc):
    payload = json.dumps(doc)
    html = (f'<html><head><script type="application/ld+json">{payload}'
            f'</script></head><body>t</body></html>').encode()
    res = page_to_triples("https://fuzz.example/p", html)
    assert res.status == "ok" and res.n_triples > 0 or res.rows == []
    # triples, if any, are serializable (canonical rows are well-formed)
    for row in res.rows:
        assert row[1] and row[2]

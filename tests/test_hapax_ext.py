"""Round-8e: hapax ratio — Python brute-force parity at sf0.001 plus
the accounting identities (hapax ≤ types ≤ instances; shares bounded)."""

from __future__ import annotations

from collections import Counter, defaultdict

from desdb_spark.extensions.hapax_ext import text_hapax_ratio_by_source
from desdb_spark.session import load_table
from tests.conftest import SF_DIR


def test_hapax_matches_brute_force(spark):
    per_source = defaultdict(Counter)
    for r in load_table(spark, SF_DIR, "documents").collect():
        per_source[r.source].update(t for t in r.text.split(" ") if t)
    got = {
        r.source: r
        for r in text_hapax_ratio_by_source(spark, SF_DIR).collect()
    }
    assert set(got) == set(per_source)
    for s, c in per_source.items():
        r = got[s]
        types, inst = len(c), sum(c.values())
        hapax = sum(1 for v in c.values() if v == 1)
        assert (r.n_types, r.n_instances, r.n_hapax) == (types, inst, hapax)
        assert r.hapax_type_share_micros == hapax * 1000000 // types
        assert r.hapax_instance_share_micros == hapax * 1000000 // inst
        assert r.n_hapax <= r.n_types <= r.n_instances
        assert 0 <= r.hapax_instance_share_micros <= r.hapax_type_share_micros

"""Daily role-mix shares and lexical diversity: closed-form checks.

Engine-vs-oracle parity at sf0.01 is covered by the driver harness
(`role_mix_daily`, `lexical_diversity`).
"""

import pytest

from sac2mseed_spark.operators.lexical import lexical_diversity
from sac2mseed_spark.operators.rolemix import DAY_US, role_mix_daily


def test_role_mix_shares(spark):
    m = spark.createDataFrame(
        [
            ("A", 0, "user", 10),
            ("A", 5, "assistant", 30),
            ("B", 9, "user", 10),
            ("C", DAY_US + 1, "tool", 7),
        ],
        "conv_id string, ts_us long, role string, token_count long",
    )
    got = {
        (r["day_start_us"], r["role"]): r
        for r in role_mix_daily(m).collect()
    }
    u = got[(0, "user")]
    assert (u["n_turns"], u["sum_tokens"]) == (2, 20)
    assert u["turn_share"] == round(2 / 3, 6)
    assert u["token_share"] == 0.4
    assert got[(DAY_US, "tool")]["turn_share"] == 1.0


def test_lexical_diversity_ttr(spark):
    t = spark.createDataFrame(
        [
            ("loop", 0, "err err err err err err err err err err"),
            ("loop", 1, "err err err err err err err err err err"),
            ("rich", 0, " ".join(f"w{i}" for i in range(20))),
            ("tiny", 0, "just three words"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    got = {
        r["conv_id"]: r for r in lexical_diversity(t, min_tokens=20).collect()
    }
    assert set(got) == {"loop", "rich"}  # tiny is under min_tokens
    assert (got["loop"]["n_tokens"], got["loop"]["n_types"]) == (20, 1)
    assert got["loop"]["ttr"] == 0.05
    assert got["rich"]["ttr"] == 1.0
    with pytest.raises(ValueError):
        lexical_diversity(t, min_tokens=0)

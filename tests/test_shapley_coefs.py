"""Pure-Python invariants of the precomputed Shapley coefficient matrix
(queries/analytic17.py) — the axioms the closed-form collapse must
satisfy for EVERY mask, asserted exhaustively (16 masks x 4 channels is
small enough to brute-force against the textbook definition)."""

from __future__ import annotations

from itertools import combinations
from math import factorial

from tvbigdataproject_spark.queries.analytic17 import _SH_COEFS, _SH_K


def _brute_phi24(j: int, mask_counts: dict[int, int]) -> int:
    """Textbook Shapley (scaled by k!) of channel j for the game
    v(S) = #converters whose channel set is a subset of S."""

    def v(s: frozenset) -> int:
        return sum(
            c
            for m, c in mask_counts.items()
            if all((m >> b) & 1 == 0 or b in s for b in range(_SH_K))
        )

    total = 0
    others = [c for c in range(_SH_K) if c != j]
    for r in range(len(others) + 1):
        for coal in combinations(others, r):
            s = frozenset(coal)
            w = factorial(len(s)) * factorial(_SH_K - len(s) - 1)
            total += w * (v(s | {j}) - v(s))
    return total


def test_matrix_matches_textbook_definition_exhaustively():
    # one unit of count on every single mask in turn: the coefficient
    # IS phi24 for that mask, so comparing column-by-column against the
    # brute-force Shapley proves the swapped-sum derivation
    for m in range(1 << _SH_K):
        counts = {m: 1}
        for j in range(_SH_K):
            assert _SH_COEFS[j][m] == _brute_phi24(j, counts), (j, m)


def test_efficiency_axiom():
    # sum over channels of phi = v(full) - v(empty): for a unit count
    # on mask m != 0 that is 1 (scaled: 24); for m = 0 it is 0
    for m in range(1 << _SH_K):
        s = sum(_SH_COEFS[j][m] for j in range(_SH_K))
        assert s == (24 if m else 0), m


def test_symmetry_and_dummy_axioms():
    # dummy: channels not in the mask get zero credit
    for m in range(1 << _SH_K):
        for j in range(_SH_K):
            if not (m >> j) & 1:
                assert _SH_COEFS[j][m] == 0
    # symmetry: channels inside the same mask share the credit equally
    for m in range(1 << _SH_K):
        vals = {_SH_COEFS[j][m] for j in range(_SH_K) if (m >> j) & 1}
        assert len(vals) <= 1, m


def test_rbo_weights_are_exact_dyadics():
    # the RBO expression spells p^i as 3^i / 4^i — both must be exact
    # doubles up to the configured depth for the shared-text division
    # to be correctly rounded on identical inputs
    from tvbigdataproject_spark.queries.llm_ops15 import _RBO_DEPTH

    for i in range(1, _RBO_DEPTH + 1):
        assert float(3**i) == 3**i
        assert float(4**i) == 4**i

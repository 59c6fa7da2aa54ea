"""Randomized property tests mirroring the reference's proptest suite
(SURVEY.md §4.1): SHPLONK rotation-set grouping is independent of the
numeric point values (shplonk.rs:142-247), and `Assigned` deferred-division
arithmetic agrees with direct field arithmetic (plonk/assigned.rs)."""

import random
from dataclasses import dataclass

import pytest

from halo2_tpu.commit.shplonk import construct_intermediate_sets
from halo2_tpu.frontend import Assigned, batch_evaluate

P = (1 << 255) - 19  # any prime works for the host-side property checks


@dataclass(frozen=True)
class Q:
    commitment: int
    point: int


def _grouping_signature(queries):
    """(frozen) structure of the rotation sets: which commitments group
    together and how many points each set has — no point values."""
    sets, supr = construct_intermediate_sets(
        queries, key_fn=lambda q: q.commitment, eval_fn=lambda q: 0)
    sig = tuple(
        (tuple(p.commitment for p in payloads), len(points))
        for payloads, points, _ in sets)
    return sig, len(supr)


def test_shplonk_grouping_independent_of_point_values():
    rng = random.Random(1234)
    for trial in range(30):
        n_comms = rng.randrange(1, 8)
        n_rotations = rng.randrange(1, 5)
        # rotation structure: commitment -> subset of rotation indices
        structure = {
            c: sorted(rng.sample(range(n_rotations),
                                 rng.randrange(1, n_rotations + 1)))
            for c in range(n_comms)
        }

        def queries_with(points):
            qs = []
            for c, rots in structure.items():
                for r in rots:
                    qs.append(Q(c, points[r]))
            return qs

        # two unrelated assignments of numeric values to the rotations
        pts_a = rng.sample(range(1, 10**9), n_rotations)
        pts_b = rng.sample(range(1, 10**9), n_rotations)
        sig_a = _grouping_signature(queries_with(pts_a))
        sig_b = _grouping_signature(queries_with(pts_b))
        assert sig_a == sig_b, f"trial {trial}: grouping depends on values"


def test_shplonk_grouping_groups_by_rotation_set():
    # commitments 0,1 share {x1}, commitment 2 queries {x1,x2}
    qs = [Q(0, 11), Q(1, 11), Q(2, 11), Q(2, 22)]
    sets, supr = construct_intermediate_sets(
        qs, key_fn=lambda q: q.commitment, eval_fn=lambda q: q.point * 7)
    assert supr == [11, 22]
    assert len(sets) == 2
    (pay0, pts0, ev0), (pay1, pts1, ev1) = sets
    assert [p.commitment for p in pay0] == [0, 1] and pts0 == [11]
    assert [p.commitment for p in pay1] == [2] and pts1 == [11, 22]
    assert ev0 == [[77], [77]] and ev1 == [[77, 154]]


def test_assigned_matches_field_arithmetic():
    rng = random.Random(99)
    for _ in range(200):
        a, b, c, d = (rng.randrange(1, P) for _ in range(4))
        x = Assigned.rational(a, b)
        y = Assigned.rational(c, d)
        xv = a * pow(b, P - 2, P) % P
        yv = c * pow(d, P - 2, P) % P
        assert (x + y).evaluate(P) == (xv + yv) % P
        assert (x - y).evaluate(P) == (xv - yv) % P
        assert (x * y).evaluate(P) == xv * yv % P
        assert (x / y).evaluate(P) == xv * pow(yv, P - 2, P) % P
        assert (-x).evaluate(P) == (P - xv) % P
        assert x.square().evaluate(P) == xv * xv % P
        assert x.cube().evaluate(P) == pow(xv, 3, P)
        assert x.invert().evaluate(P) == pow(xv, P - 2, P)
        assert (x + 5).evaluate(P) == (xv + 5) % P
        assert (3 * x).evaluate(P) == 3 * xv % P


def test_assigned_zero_conventions():
    z = Assigned.zero()
    assert z.is_zero_vartime()
    assert z.invert().evaluate(P) == 0          # 0^-1 -> 0 convention
    assert (z * Assigned.rational(3, 7)).evaluate(P) == 0
    with pytest.raises(ZeroDivisionError):
        Assigned.rational(1, 0)
    assert Assigned.rational(6, 3) == Assigned.trivial(2)


def test_batch_evaluate_one_inversion():
    rng = random.Random(7)
    vals = [Assigned.rational(rng.randrange(1, P), rng.randrange(1, P))
            for _ in range(50)]
    vals[10] = Assigned.zero()
    vals[20] = Assigned.trivial(42)
    got = batch_evaluate(P, vals)
    want = [v.evaluate(P) for v in vals]
    assert got == want


def test_value_to_field_deferred_inversion():
    from halo2_tpu.frontend import Value
    from halo2_tpu.frontend.circuit import _reduce_value
    v = Value.known(12).to_field().invert()
    inner = v.value()
    assert isinstance(inner, Assigned)
    assert _reduce_value(inner, P) == pow(12, P - 2, P)
    assert Value.unknown().invert().value() is None


def test_materialize_column_batched():
    """batch_invert_assigned equivalent (frontend/src/circuit.rs:363-404):
    a column of deferred rationals resolves with one inversion, matching
    per-cell evaluate()."""
    from halo2_tpu.fields import PASTA_FP
    from halo2_tpu.frontend.assigned import Assigned
    from halo2_tpu.frontend.circuit import _materialize_column
    p = PASTA_FP.p
    col = [Assigned.rational(7, 3), 5, Assigned.zero(),
           Assigned.rational(1, p - 2), Assigned.trivial(9), 0]
    out = _materialize_column(p, col)
    expect = [v.evaluate(p) if isinstance(v, Assigned) else v % p
              for v in col]
    assert out == expect
    # all-trivial fast path
    assert _materialize_column(p, [1, 2, Assigned.trivial(3)]) == [1, 2, 3]

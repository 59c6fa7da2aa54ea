"""Device permute_expression_pair vs the host reference logic."""

import random

import pytest

from halo2_tpu.fields import PASTA_FP as F
from halo2_tpu.plonk.lookup_sort import permute_expression_pair_device


def host_permute(in_ints, tab_ints):
    perm_in = sorted(in_ints)
    leftover = {}
    for v in tab_ints:
        leftover[v] = leftover.get(v, 0) + 1
    usable = len(in_ints)
    perm_tab = [0] * usable
    repeated = []
    for row, v in enumerate(perm_in):
        if row == 0 or v != perm_in[row - 1]:
            perm_tab[row] = v
            if leftover.get(v, 0) > 0:
                leftover[v] -= 1
            else:
                raise ValueError("not in table")
        else:
            repeated.append(row)
    for v in sorted(leftover):
        for _ in range(leftover[v]):
            perm_tab[repeated.pop()] = v
    return perm_in, perm_tab


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_device_matches_host(seed):
    rng = random.Random(seed)
    usable = 57
    table_vals = [rng.randrange(F.p) for _ in range(7)] + [0]
    tab = [table_vals[rng.randrange(len(table_vals))] for _ in range(usable)]
    present = sorted(set(tab))
    ins = [present[rng.randrange(len(present))] for _ in range(usable)]
    want_in, want_tab = host_permute(ins, tab)
    a, s = permute_expression_pair_device(
        F, F.encode_ints(ins), F.encode_ints(tab), usable)
    assert F.decode_ints(a) == want_in
    assert F.decode_ints(s) == want_tab


def test_device_detects_missing_value():
    usable = 16
    tab = [5] * usable
    ins = [5] * (usable - 1) + [7]
    with pytest.raises(ValueError):
        permute_expression_pair_device(
            F, F.encode_ints(ins), F.encode_ints(tab), usable)


def test_all_equal_inputs():
    usable = 20
    tab = list(range(1, usable + 1))
    ins = [3] * usable
    want_in, want_tab = host_permute(ins, tab)
    a, s = permute_expression_pair_device(
        F, F.encode_ints(ins), F.encode_ints(tab), usable)
    assert F.decode_ints(a) == want_in
    assert F.decode_ints(s) == want_tab

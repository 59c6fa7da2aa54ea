"""Backend keygen: verifying/proving keys.

Mirrors halo2_backend/src/plonk/keygen.rs (query collection :192-247, vk
:43-91, pk :94-190) and permutation/keygen.rs (cycle merge :20-118,
build_vk/build_pk :137-280).  All polynomial data lands on device as stacked
column arrays; commitments are normalized to host affine ints for the
transcript.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from ..fields.field import Field, NLIMBS
from ..frontend.circuit import CompiledCircuit
from ..frontend.constraint_system import ConstraintSystem
from ..frontend.expression import ADVICE, FIXED, INSTANCE, Column, Rotation
from ..ntt import powers
from ..poly.domain import EvaluationDomain
from ..commit.base import Blind


class ConstraintSystemBack:
    """Frontend CS + indexed query lists (backend circuit.rs:57-95)."""

    def __init__(self, cs: ConstraintSystem, p: int = 0):
        self.cs = cs
        self.p = p  # scalar modulus, for canonical constant rendering
        self.advice_queries: List[Tuple[Column, Rotation]] = []
        self.fixed_queries: List[Tuple[Column, Rotation]] = []
        self.instance_queries: List[Tuple[Column, Rotation]] = []
        self._index: Dict = {}
        self.num_advice_queries = [0] * cs.num_advice_columns

        def add(column: Column, rot: Rotation):
            key = (column.kind, column.index, rot.i)
            if key in self._index:
                return
            lst = {ADVICE: self.advice_queries, FIXED: self.fixed_queries,
                   INSTANCE: self.instance_queries}[column.kind]
            self._index[key] = len(lst)
            lst.append((column, rot))
            if column.kind == ADVICE:
                self.num_advice_queries[column.index] += 1

        def walk(expr):
            expr.evaluate(
                lambda _: None, lambda _: None,
                lambda c, r: add(c, r), lambda _: None,
                lambda a: None, lambda a, b: None, lambda a, b: None,
                lambda a, _: None)

        for gate in cs.gates:
            for poly in gate.polys:
                walk(poly)
        for lk in cs.lookups:
            for e in lk.input_expressions + lk.table_expressions:
                walk(e)
        for sh in cs.shuffles:
            for e in sh.input_expressions + sh.shuffle_expressions:
                walk(e)
        for col in cs.permutation.columns:
            add(col, Rotation(0))

    def get_query_index(self, column: Column, rot: Rotation) -> int:
        return self._index[(column.kind, column.index, rot.i)]

    def degree(self) -> int:
        return self.cs.degree()

    def blinding_factors(self) -> int:
        factors = max(self.num_advice_queries + [1])
        return max(3, factors) + 1 + 1

    def usable_rows(self, n: int) -> int:
        return n - (self.blinding_factors() + 1)


# ----------------------------------------------------------------------
# permutation assembly (cycle merge)
# ----------------------------------------------------------------------

class PermutationAssembly:
    """permutation/keygen.rs:20-118."""

    def __init__(self, n: int, columns: List[Column]):
        self.n = n
        self.columns = columns
        m = len(columns)
        self.mapping = [[(j, i) for i in range(n)] for j in range(m)]
        self.aux = [[(j, i) for i in range(n)] for j in range(m)]
        self.sizes = [[1] * n for _ in range(m)]
        self._col_idx = {c: j for j, c in enumerate(columns)}

    def copy(self, lcol: Column, lrow: int, rcol: Column, rrow: int):
        if lcol not in self._col_idx:
            raise ValueError(f"column {lcol} not in permutation "
                             "(missing enable_equality?)")
        if rcol not in self._col_idx:
            raise ValueError(f"column {rcol} not in permutation "
                             "(missing enable_equality?)")
        left = (self._col_idx[lcol], lrow)
        right = (self._col_idx[rcol], rrow)
        left_cycle = self.aux[left[0]][left[1]]
        right_cycle = self.aux[right[0]][right[1]]
        if left_cycle == right_cycle:
            return
        if (self.sizes[left_cycle[0]][left_cycle[1]] <
                self.sizes[right_cycle[0]][right_cycle[1]]):
            left_cycle, right_cycle = right_cycle, left_cycle
        self.sizes[left_cycle[0]][left_cycle[1]] += \
            self.sizes[right_cycle[0]][right_cycle[1]]
        i = right_cycle
        while True:
            self.aux[i[0]][i[1]] = left_cycle
            i = self.mapping[i[0]][i[1]]
            if i == right_cycle:
                break
        lm = self.mapping[left[0]][left[1]]
        self.mapping[left[0]][left[1]] = self.mapping[right[0]][right[1]]
        self.mapping[right[0]][right[1]] = lm

    def sigma_values(self, F: Field, domain: EvaluationDomain) -> List[List[int]]:
        """sigma_j(omega^i) = delta^{j'} omega^{i'} where mapping maps (j,i)
        to (j',i') (permutation/keygen.rs build_pk deltaomega table)."""
        p = F.p
        omega_powers = [1] * self.n
        for i in range(1, self.n):
            omega_powers[i] = (omega_powers[i - 1] * domain.omega) % p
        delta_powers = [1] * max(len(self.columns), 1)
        for j in range(1, len(self.columns)):
            delta_powers[j] = (delta_powers[j - 1] * F.delta) % p
        out = []
        for j in range(len(self.columns)):
            col = []
            for i in range(self.n):
                jj, ii = self.mapping[j][i]
                col.append((delta_powers[jj] * omega_powers[ii]) % p)
            out.append(col)
        return out


# ----------------------------------------------------------------------
# keys
# ----------------------------------------------------------------------

@dataclass
class PermutationVK:
    commitments: List   # affine (x, y) per sigma column


@dataclass
class PermutationPK:
    permutations: jnp.ndarray    # (m, n, L) lagrange sigma values
    polys: jnp.ndarray           # (m, n, L) coeff
    cosets: jnp.ndarray          # (m, ext_n, L)


class VerifyingKey:
    def __init__(self, F: Field, curve, domain: EvaluationDomain,
                 cs_back: ConstraintSystemBack, fixed_commitments: List,
                 permutation_vk: PermutationVK, k: int):
        self.F = F
        self.curve = curve
        self.domain = domain
        self.cs = cs_back
        self.cs_degree = cs_back.degree()
        self.fixed_commitments = fixed_commitments
        self.permutation = permutation_vk
        self.k = k
        self.transcript_repr = self._compute_repr()

    def pinned(self) -> str:
        """`format!("{:#?}", vk.pinned())` — the pretty Debug string the
        reference pins as its golden vector (plonk_api.rs:659-1141).
        Byte-identical to the Rust output (compat/pinned.py)."""
        from ..compat.pinned import pinned_pretty
        return pinned_pretty(self)

    def pinned_compact(self) -> str:
        """`format!("{:?}", vk.pinned())` — the vk-hash preimage form
        (plonk.rs:194-198)."""
        from ..compat.pinned import pinned_compact
        return pinned_compact(self)

    def _compute_repr(self) -> int:
        """Pinned-vk hash (plonk.rs:189-202): Blake2b-512 with the
        Halo2-Verify-Key personalization over the u64-LE length-prefixed
        compact Debug string, reduced via from_uniform_bytes."""
        s = self.pinned_compact().encode()
        h = hashlib.blake2b(digest_size=64, person=b"Halo2-Verify-Key")
        h.update(len(s).to_bytes(8, "little"))
        h.update(s)
        return self.F.from_uniform_bytes(h.digest())

    def hash_into(self, transcript):
        transcript.common_scalar(self.transcript_repr)


class ProvingKey:
    def __init__(self, vk: VerifyingKey, l0, l_last, l_active_row,
                 fixed_values, fixed_polys, fixed_cosets,
                 permutation_pk: PermutationPK, evaluator):
        self.vk = vk
        self.l0 = l0                      # (ext_n, L)
        self.l_last = l_last
        self.l_active_row = l_active_row
        self.fixed_values = fixed_values  # (nf, n, L) lagrange
        self.fixed_polys = fixed_polys    # (nf, n, L) coeff
        self.fixed_cosets = fixed_cosets  # (nf, ext_n, L)
        self.permutation = permutation_pk
        self.ev = evaluator


def keygen(F: Field, params, compiled: CompiledCircuit, k: int,
           engine=None) -> ProvingKey:
    """keygen_vk + keygen_pk fused (they share all heavy intermediates).

    `engine` is the PlonkEngine seam (engine.py, mirroring zal.rs:182-243):
    when it carries a mesh, commitments run on sharded descriptor MSMs and
    every domain transform routes through the distributed NTT."""
    from .prover import Evaluator   # local import to avoid cycle

    curve = params.curve
    cs = compiled.cs
    import os as _os
    import time as _time
    _dbg = _os.environ.get("HALO2_TPU_DEBUG_KEYGEN") == "1"
    _t = [_time.time()]

    def _kt(name):
        if _dbg:
            now = _time.time()
            print(f"[keygen] {name}: {now - _t[0]:.1f}s", flush=True)
            _t[0] = now

    cs_back = ConstraintSystemBack(cs, F.p)
    n = 1 << k
    degree = max(cs_back.degree(), 2)
    domain = EvaluationDomain(F, degree, k)
    if engine is not None:
        params.set_engine(engine)
        if engine.mesh is not None:
            domain.set_mesh(engine.mesh)

    # fixed columns -> device
    nf = cs.num_fixed_columns
    if nf:
        flat = [v % F.p for col in compiled.preprocessing.fixed for v in
                (col + [0] * (n - len(col)))]
        fixed_values = F.encode_ints(flat).reshape(nf, n, NLIMBS)
    else:
        fixed_values = F.zeros((0, n))
    fixed_polys = domain.lagrange_to_coeff(fixed_values) if nf else fixed_values
    fixed_cosets = domain.coeff_to_extended(fixed_polys) if nf else \
        F.zeros((0, domain.extended_n))

    _kt('fixed encode+ffts')
    fixed_commitments = [
        params.commit_affine_lagrange(fixed_values[i], Blind(1))
        for i in range(nf)]

    _kt('fixed commits')
    # permutation
    assembly = PermutationAssembly(n, cs.permutation.columns)
    for (lc, lr), (rc, rr) in compiled.preprocessing.copies:
        assembly.copy(lc, lr, rc, rr)
    _kt('perm cycle merge')
    sigma_ints = assembly.sigma_values(F, domain)
    m = len(cs.permutation.columns)
    if m:
        sigmas = F.encode_ints(
            [v for col in sigma_ints for v in col]).reshape(m, n, NLIMBS)
        sigma_polys = domain.lagrange_to_coeff(sigmas)
        sigma_cosets = domain.coeff_to_extended(sigma_polys)
        perm_commitments = [
            params.commit_affine_lagrange(sigmas[i], Blind(1))
            for i in range(m)]
    else:
        sigmas = sigma_polys = F.zeros((0, n))
        sigma_cosets = F.zeros((0, domain.extended_n))
        perm_commitments = []

    _kt('sigma values+ffts+commits')
    vk = VerifyingKey(F, curve, domain, cs_back, fixed_commitments,
                      PermutationVK(perm_commitments), k)

    # l0, l_blind, l_last as extended-domain evaluations (keygen.rs:134-166)
    blinding_factors = cs_back.blinding_factors()

    def lagrange_basis_ext(rows: List[int]):
        col = [0] * n
        for r in rows:
            col[r] = 1
        arr = F.encode_ints(col)
        return domain.coeff_to_extended(domain.lagrange_to_coeff(arr))

    l0 = lagrange_basis_ext([0])
    l_last = lagrange_basis_ext([n - blinding_factors - 1])
    l_blind = lagrange_basis_ext(
        list(range(n - blinding_factors, n)))
    one = F.ones((domain.extended_n,))
    l_active_row = F.sub(F.sub(one, l_last), l_blind)

    _kt('vk hash + lagrange basis')
    evaluator = Evaluator(F, domain, cs_back,
                          salt=format(vk.transcript_repr, "x"))

    return ProvingKey(vk, l0, l_last, l_active_row, fixed_values,
                      fixed_polys, fixed_cosets,
                      PermutationPK(sigmas, sigma_polys, sigma_cosets),
                      evaluator)


def keygen_vk(F: Field, params, compiled: CompiledCircuit, k: int) -> VerifyingKey:
    return keygen(F, params, compiled, k).vk

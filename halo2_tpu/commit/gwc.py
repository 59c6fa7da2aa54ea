"""KZG multiopen, GWC variant (poly/kzg/multiopen/gwc{,/prover,/verifier}.rs).

One witness commitment per distinct opening point: W_z = commit(sum_i v^i
(p_i - eval_i) / (X - z)); the verifier folds everything into the DualMSM
with powers of u.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

import functools

import jax

from ..poly.arith import _kate_division_jit, tree_sum
from .base import Blind, ProverQuery, VerifierQuery
from .kzg import ParamsKZG, MSMKZG, DualMSM, GuardKZG


@functools.partial(jax.jit, static_argnums=0)
def _fold_kate(F, stack, vpows, z):
    """W_z numerator fold + division by (X - z) in one dispatch:
    (sum_i v^i p_i) / (X - z)  — gwc/prover.rs:58-90 (the eval subtraction
    is unnecessary: kate division drops exactly that remainder)."""
    batch = tree_sum(F, F.mul(stack, vpows[:, None, :]), axis=0)
    return _kate_division_jit(F, batch, z)


def _group_by_point(queries):
    """gwc.rs:25-49: group queries by point, first-appearance order."""
    order = []
    groups = {}
    for q in queries:
        if q.point not in groups:
            order.append(q.point)
            groups[q.point] = []
        groups[q.point].append(q)
    return [(pt, groups[pt]) for pt in order]


class ProverGWC:
    QUERY_INSTANCE = False

    def __init__(self, params: ParamsKZG):
        self.params = params

    def create_proof(self, rng, transcript, queries: List[ProverQuery]):
        from ..poly.poly import COEFF, unwrap as unwrap_basis
        F = self.params.curve.Fr
        p = F.p
        v = transcript.squeeze_challenge()
        for z, qs in _group_by_point(queries):
            vpows = [1] * len(qs)
            for i in range(1, len(qs)):
                vpows[i] = vpows[i - 1] * v % p
            stack = jnp.stack(
                [unwrap_basis(q.poly_ref.poly, COEFF, "ProverGWC")
                 for q in qs], axis=0)
            witness = _fold_kate(F, stack, F.encode_ints(vpows),
                                 F.encode_int(z))
            transcript.write_point(self.params.commit_affine(witness))


class VerifierGWC:
    QUERY_INSTANCE = False

    def __init__(self, params: ParamsKZG):
        self.params = params

    def verify_proof(self, transcript, queries: List[VerifierQuery],
                     msm_accumulator: DualMSM) -> GuardKZG:
        params = self.params
        p = params.curve.Fr.p
        v = transcript.squeeze_challenge()
        groups = _group_by_point(queries)
        w = [transcript.read_point() for _ in groups]
        u = transcript.squeeze_challenge()

        commitment_multi = MSMKZG(params)
        eval_multi = 0
        witness = MSMKZG(params)
        witness_with_aux = MSMKZG(params)

        power_u = 1
        for (z, qs), wi in zip(groups, w):
            batch = MSMKZG(params)
            eval_batch = 0
            power_v = 1
            for q in qs:
                if q.is_msm:
                    m = q.commitment.clone()
                    m.scale(power_v)
                    batch.add_msm(m)
                else:
                    batch.append_term(power_v, q.commitment)
                eval_batch = (eval_batch + power_v * q.eval) % p
                power_v = power_v * v % p
            batch.scale(power_u)
            commitment_multi.add_msm(batch)
            eval_multi = (eval_multi + power_u * eval_batch) % p
            witness_with_aux.append_term(power_u * z % p, wi)
            witness.append_term(power_u, wi)
            power_u = power_u * u % p

        msm_accumulator.left.add_msm(witness)
        msm_accumulator.right.add_msm(witness_with_aux)
        msm_accumulator.right.add_msm(commitment_multi)
        # -eval_multi * G1
        g0 = (params.curve.gen_x, params.curve.gen_y)
        neg = (g0[0], (-g0[1]) % params.curve.Fq.p)
        msm_accumulator.right.append_term(eval_multi, neg)
        return GuardKZG(msm_accumulator)

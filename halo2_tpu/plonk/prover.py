"""PLONK prover: phase state machine + the 14-step proof pipeline.

Mirror of halo2_backend/src/plonk/prover.rs (state machine :174-494, proof
steps :512-899) with the lookup (lookup/prover.rs), permutation
(permutation/prover.rs), shuffle (shuffle/prover.rs) and vanishing
(vanishing/prover.rs) arguments, re-built around batched device compute:

- column sets move through iFFT/coset-FFT as stacked arrays,
- grand products use batch inversion + log-depth prefix products,
- the h(X) quotient is one traced XLA computation over the extended domain
  (the `GraphEvaluator` equivalent — XLA does the CSE/fusion),
- transcript traffic and challenge derivation stay on the host between
  device phases.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..fields.field import Field, NLIMBS
from ..frontend.expression import ADVICE, FIXED, INSTANCE, Rotation
from ..ntt import powers
from ..poly.arith import eval_polynomial, prefix_product
from ..poly.domain import Rotation as DomRotation
from ..poly.poly import Poly
from ..commit.base import Blind, PolyRef, ProverQuery
from .evaluation import evaluate_expression
from .keygen import ProvingKey


def _sanity_on() -> bool:
    """HALO2_TPU_SANITY=1 enables the reference's `sanity-checks` feature
    tier: expensive in-prover invariant asserts (lookup grand product
    lookup/prover.rs:269-305, permuted-pair invariant :475-488, unblinded
    advice rows zero prover.rs:418-421)."""
    import os
    return os.environ.get("HALO2_TPU_SANITY") == "1"


def _random_poly_device(F: Field, n: int, rng):
    """n uniform field elements as (n, NLIMBS) Montgomery limbs, built on
    device from 384 rng-derived bits each (bias < 2^-128): value =
    hi*2^192 + lo with hi, lo < 2^192 encoded directly as limb arrays."""
    import numpy as np
    seed = rng.getrandbits(64)
    g = np.random.Generator(np.random.PCG64(seed))
    raw = g.integers(0, 1 << 16, size=(n, 24), dtype=np.uint32)
    lo = np.zeros((n, NLIMBS), np.uint32)
    hi = np.zeros((n, NLIMBS), np.uint32)
    lo[:, :12] = raw[:, :12]
    hi[:, :12] = raw[:, 12:]
    c192 = F.encode_int(pow(2, 192, F.p))
    return F.add(F.mul(F.to_mont(jnp.asarray(hi)), c192),
                 F.to_mont(jnp.asarray(lo)))


def _enc_list(F: Field, xs: List[int]):
    return F.encode_ints(xs)


class Evaluator:
    """Builds and caches the jitted h-evaluation (plonk/evaluation.rs:317-623).

    Structure (TPU-first rework of the reference's single fused row loop):

    - every coeff->extended coset transform runs as ONE batched NTT per
      argument (all advice columns stacked, all permutation z's stacked,
      each lookup's (z, a', s') stacked) — large batched transforms keep
      the MXU busy and the dispatch count low;
    - the elementwise constraint accumulation is split into four jitted
      passes (gates / permutation / per-lookup / per-shuffle).  Each pass
      is NTT-free so it traces and compiles in seconds even at k>=18 (the
      old monolithic jit inlined ~15 four-step NTT graphs and took >30 min
      to compile through the remote-compile tunnel);
    - lookup/shuffle cosets are *streamed*: computed immediately before
      their accumulator call and dead immediately after, mirroring the
      reference's per-lookup coset streaming (evaluation.rs:486-558) —
      peak HBM is the column cosets + one argument's cosets, not the sum
      over all lookups.
    """

    def __init__(self, F: Field, domain, cs_back, salt: str = ""):
        self.F = F
        self.domain = domain
        self.cs_back = cs_back
        # AOT-artifact salt identifying the EXPRESSION STRUCTURE (the vk
        # transcript hash at keygen): lets fresh processes load the traced
        # h-pass accumulators from disk instead of re-tracing (aot.py)
        self.salt = salt
        self._compiled = {}
        # X values over the extended coset domain: zeta * ext_omega^i
        pts = powers(F, F.encode_int(domain.extended_omega), domain.extended_n)
        self.ext_points = F.mul(pts, F.encode_int(domain.g_coset))

    # -- jitted accumulator cache ----------------------------------------

    def _acc(self, key, builder):
        """Cache of per-stage accumulators.  The key carries the stage and
        argument index; expression structure is static per cs_back (one
        Evaluator per pk), so compiled fns are reused across circuits and
        proofs — and AOT-exported to disk (keyed by the vk-hash salt) so
        fresh processes skip the trace."""
        if key not in self._compiled:
            import os
            fn = builder()
            if os.environ.get("HALO2_TPU_EAGER_H") == "1" or \
                    self.domain._mesh is not None:
                # eager escape hatch (debugging) / meshed path: the sub-ops
                # (shard_map NTTs, elementwise field kernels) each compile
                # once and are reused; jitting whole passes with SPMD
                # partitioning is slow to compile on virtual meshes.
                self._compiled[key] = fn
            elif self.salt:
                from ..aot import aot
                stage = "_".join(str(x) for x in key[1:])
                self._compiled[key] = aot(
                    jax.jit(fn), f"heval_{stage}", salt=self.salt)
            else:
                self._compiled[key] = jax.jit(fn)
        return self._compiled[key]

    def evaluate_h(self, pk: "ProvingKey", advice_polys, instance_polys,
                   challenges, y, beta, gamma, theta, lookups, shuffles,
                   permutations):
        """All list args are per-circuit; polys are coeff-form device arrays.

        lookups[c][l] = (product_poly, permuted_input_poly, permuted_table_poly)
        shuffles[c][s] = product_poly
        permutations[c] = [z_poly per set]
        All polys are basis-typed `Poly` (coeff); the tag is checked at the
        coset transforms and stripped before the jitted accumulators (tags
        are host-side typing, not device data).
        Returns extended-domain evaluations of the numerator of h.
        """
        F, domain, cs = self.F, self.domain, self.cs_back
        ext_n = domain.extended_n
        pid = id(pk)
        value = F.zeros((ext_n,))

        def to_ext(poly_or_stack):
            return domain.coeff_to_extended(poly_or_stack).values

        for c in range(len(advice_polys)):
            advice_c = to_ext(advice_polys[c]) \
                if advice_polys[c].shape[0] else F.zeros((0, ext_n))
            instance_c = to_ext(instance_polys[c]) \
                if instance_polys[c].shape[0] else F.zeros((0, ext_n))
            cols = (pk.fixed_cosets, advice_c, instance_c)

            # ---- custom gates (evaluation.rs:375-401)
            value = self._acc((pid, "gates"), self._build_gates)(
                value, y, challenges, *cols)

            # ---- permutation argument (evaluation.rs:404-483)
            sets = permutations[c]
            if sets:
                exts = to_ext(Poly.stack(sets))
                value = self._acc((pid, "perm", len(sets)),
                                  lambda: self._build_perm(len(sets)))(
                    value, y, beta, gamma, exts, pk.l0, pk.l_last,
                    pk.l_active_row, pk.permutation.cosets, self.ext_points,
                    *cols)

            # ---- lookups, cosets streamed per argument (:486-558)
            for li, (z_poly, a_poly, s_poly) in enumerate(lookups[c]):
                zas = to_ext(Poly.stack([z_poly, a_poly, s_poly]))
                value = self._acc((pid, "lookup", li),
                                  lambda: self._build_lookup(cs.cs.lookups[li]))(
                    value, y, beta, gamma, theta, challenges, zas,
                    pk.l0, pk.l_last, pk.l_active_row, *cols)

            # ---- shuffles, streamed (:561-620)
            for si, z_poly in enumerate(shuffles[c]):
                z_ext = to_ext(z_poly)
                value = self._acc((pid, "shuffle", si),
                                  lambda: self._build_shuffle(cs.cs.shuffles[si]))(
                    value, y, theta, gamma, challenges, z_ext,
                    pk.l0, pk.l_last, pk.l_active_row, *cols)

        return Poly.extended(value)

    # -- accumulator builders (elementwise-only; expressions are static) --

    def _ev(self, expr, fixed, advice, instance, challenges):
        rot_scale = 1 << (self.domain.extended_k - self.domain.k)
        return evaluate_expression(
            self.F, expr, fixed=fixed, advice=advice, instance=instance,
            challenges={i: ch for i, ch in enumerate(challenges)},
            rot_scale=rot_scale)

    def _build_gates(self):
        F, cs = self.F, self.cs_back

        def acc(value, y, challenges, fixed, advice, instance):
            for gate in cs.cs.gates:
                for poly in gate.polys:
                    value = F.add(F.mul(value, y), self._ev(
                        poly, fixed, advice, instance, challenges))
            return value
        return acc

    def _build_perm(self, n_sets):
        F, domain, cs = self.F, self.domain, self.cs_back
        one = F.ones(())
        last_rot = -(cs.blinding_factors() + 1)
        chunk_len = cs.degree() - 2
        columns = cs.cs.permutation.columns

        def acc(value, y, beta, gamma, exts, l0, l_last, l_active,
                sigma_cosets, ext_points, fixed, advice, instance):
            # ext_points is an ARGUMENT: closing over the (ext_n, L) device
            # array would embed 134MB (k=18) into the MLIR module at every
            # lowering (fetched host-side through the tunnel first)
            kind_map = {ADVICE: advice, FIXED: fixed, INSTANCE: instance}
            # l_0(X) * (1 - z_0(X))
            value = F.add(F.mul(value, y), F.mul(l0, F.sub(one, exts[0])))
            # l_last(X) * (z_l(X)^2 - z_l(X))
            value = F.add(F.mul(value, y), F.mul(
                l_last, F.sub(F.square(exts[-1]), exts[-1])))
            # l_0(X) * (z_i(X) - z_{i-1}(omega^last X))
            for i in range(1, n_sets):
                prev_rot = domain.rotate_extended(
                    exts[i - 1], DomRotation(last_rot))
                value = F.add(F.mul(value, y),
                              F.mul(l0, F.sub(exts[i], prev_rot)))
            # product constraints per chunk
            for ci in range(n_sets):
                z_ext = exts[ci]
                chunk = columns[ci * chunk_len:(ci + 1) * chunk_len]
                left = domain.rotate_extended(z_ext, DomRotation(1))
                right = z_ext
                delta_pow = pow(F.delta, ci * chunk_len, F.p)
                cur_delta = F.mul(F.mul(beta, ext_points),
                                  F.encode_int(delta_pow))
                for j, col in enumerate(chunk):
                    vals = kind_map[col.kind][col.index]
                    sigma = sigma_cosets[ci * chunk_len + j]
                    left = F.mul(left, F.add(F.add(
                        vals, F.mul(beta, sigma)), gamma))
                    right = F.mul(right, F.add(F.add(
                        vals, cur_delta), gamma))
                    cur_delta = F.mul(cur_delta, F.encode_int(F.delta))
                value = F.add(F.mul(value, y),
                              F.mul(F.sub(left, right), l_active))
            return value
        return acc

    def _compress(self, exprs, theta, fixed, advice, instance, challenges):
        F = self.F
        acc = F.zeros((self.domain.extended_n,))
        for e in exprs:
            acc = F.add(F.mul(acc, theta),
                        self._ev(e, fixed, advice, instance, challenges))
        return acc

    def _build_lookup(self, lk_arg):
        F, domain = self.F, self.domain
        one = F.ones(())

        def acc(value, y, beta, gamma, theta, challenges, zas,
                l0, l_last, l_active, fixed, advice, instance):
            z_ext, a_ext, s_ext = zas[0], zas[1], zas[2]
            z_next = domain.rotate_extended(z_ext, DomRotation(1))
            a_prev = domain.rotate_extended(a_ext, DomRotation(-1))
            comp_in = self._compress(lk_arg.input_expressions, theta,
                                     fixed, advice, instance, challenges)
            comp_tab = self._compress(lk_arg.table_expressions, theta,
                                      fixed, advice, instance, challenges)
            # l_0 * (1 - z)
            value = F.add(F.mul(value, y), F.mul(l0, F.sub(one, z_ext)))
            # l_last * (z^2 - z)
            value = F.add(F.mul(value, y),
                          F.mul(l_last, F.sub(F.square(z_ext), z_ext)))
            # active * (z(wX)(a'+b)(s'+g) - z(X)(A+b)(S+g))
            left = F.mul(F.mul(z_next, F.add(a_ext, beta)),
                         F.add(s_ext, gamma))
            right = F.mul(F.mul(z_ext, F.add(comp_in, beta)),
                          F.add(comp_tab, gamma))
            value = F.add(F.mul(value, y),
                          F.mul(F.sub(left, right), l_active))
            # l_0 * (a' - s')
            value = F.add(F.mul(value, y), F.mul(l0, F.sub(a_ext, s_ext)))
            # active * (a' - s') * (a' - a'(w^-1 X))
            value = F.add(F.mul(value, y),
                          F.mul(F.mul(F.sub(a_ext, s_ext),
                                      F.sub(a_ext, a_prev)), l_active))
            return value
        return acc

    def _build_shuffle(self, sh_arg):
        F, domain = self.F, self.domain
        one = F.ones(())

        def acc(value, y, theta, gamma, challenges, z_ext,
                l0, l_last, l_active, fixed, advice, instance):
            z_next = domain.rotate_extended(z_ext, DomRotation(1))
            comp_in = self._compress(sh_arg.input_expressions, theta,
                                     fixed, advice, instance, challenges)
            comp_sh = self._compress(sh_arg.shuffle_expressions, theta,
                                     fixed, advice, instance, challenges)
            value = F.add(F.mul(value, y), F.mul(l0, F.sub(one, z_ext)))
            value = F.add(F.mul(value, y),
                          F.mul(l_last, F.sub(F.square(z_ext), z_ext)))
            left = F.mul(z_next, F.add(comp_sh, gamma))
            right = F.mul(z_ext, F.add(comp_in, gamma))
            value = F.add(F.mul(value, y),
                          F.mul(F.sub(left, right), l_active))
            return value
        return acc


class Prover:
    """Multi-circuit prover state machine (prover.rs:130-899)."""

    def __init__(self, params, pk: ProvingKey, instances: List[List[List[int]]],
                 rng, transcript, query_instance: bool, engine=None):
        """instances: per circuit, per instance column, list of values.
        query_instance: True for IPA (commit instances), False for KZG
        (absorb values as common scalars)."""
        self.params = params
        self.pk = pk
        self.F = pk.vk.F
        self.curve = params.curve
        self.rng = rng
        self.transcript = transcript
        self.query_instance = query_instance
        self.engine = engine
        self.mesh = engine.mesh if engine is not None else None
        if engine is not None:
            params.set_engine(engine)
            if engine.mesh is not None and pk.vk.domain._mesh is None:
                pk.vk.domain.set_mesh(engine.mesh)
        self.challenges: Dict[int, int] = {}
        self.next_phase_index = 0
        cs = pk.vk.cs.cs
        for inst in instances:
            if len(inst) != cs.num_instance_columns:
                raise ValueError("invalid number of instance columns")

        F = self.F
        domain = pk.vk.domain
        n = domain.n
        bf = pk.vk.cs.blinding_factors()

        # [TRANSCRIPT-1] vk hash
        pk.vk.hash_into(transcript)

        # [TRANSCRIPT-2] instances
        self.instance_values = []   # per circuit: (ni, n, L) lagrange
        self.instance_polys = []    # per circuit: (ni, n, L) coeff
        for inst in instances:
            cols = []
            for values in inst:
                if len(values) > n - (bf + 1):
                    raise ValueError("instance too large")
                if not query_instance:
                    for v in values:
                        transcript.common_scalar(v % F.p)
                cols.append([v % F.p for v in values] +
                            [0] * (n - len(values)))
            ni = len(cols)
            vals = F.encode_ints([v for col in cols for v in col]).reshape(
                ni, n, NLIMBS) if ni else F.zeros((0, n))
            if query_instance:
                for i in range(ni):
                    comm = params.commit_affine_lagrange(
                        Poly.lagrange(vals[i]), Blind(1))
                    transcript.common_point(comm)
            self.instance_values.append(vals)
            self.instance_polys.append(
                domain.lagrange_to_coeff(Poly.lagrange(vals)) if ni
                else Poly.coeff(vals))

        na = cs.num_advice_columns
        self.advice_values = [F.zeros((na, n)) for _ in instances]
        self.advice_blinds = [[Blind(1)] * na for _ in instances]

    # ------------------------------------------------------------------

    def commit_phase(self, phase: int,
                     witnesses: List[Dict[int, List[int]]]) -> Dict[int, int]:
        """witnesses: per circuit, {advice_col_index: values} for this phase.
        Returns the challenge dict after this phase.  (prover.rs:309-494)"""
        F = self.F
        pk = self.pk
        cs = pk.vk.cs.cs
        n = pk.vk.domain.n
        bf = pk.vk.cs.blinding_factors()
        unusable_start = n - (bf + 1)
        unblinded = set(cs.unblinded_advice_columns)
        rng = self.rng

        column_indices = [i for i, ph in enumerate(cs.advice_column_phase)
                          if ph == phase]

        for circ, witness in enumerate(witnesses):
            assert set(witness.keys()) == set(column_indices), \
                f"witness columns {set(witness.keys())} != phase columns"
            if not column_indices:
                continue
            # batched phase commit (prover.rs:401-477, restructured): ONE
            # host serialization + to-Montgomery dispatch for all phase
            # columns, per-column MSMs, then ONE batched normalization +
            # host fetch for all the commitments (the per-column
            # encode/normalize loop dominated the k=18 step time)
            col_vals, blinds = [], []
            for ci in column_indices:
                values = [v % F.p for v in witness[ci]]
                assert len(values) == n
                if ci not in unblinded:
                    for r in range(unusable_start, n):
                        values[r] = rng.randrange(F.p)
                    blind = Blind(rng.randrange(F.p))
                else:
                    if _sanity_on():
                        # prover.rs:418-421: unblinded columns must already
                        # be zero on the blinding rows
                        assert all(v == 0 for v in
                                   values[unusable_start:]), \
                            f"unblinded column {ci} nonzero blinding rows"
                    blind = Blind(1)
                col_vals.append(values)
                blinds.append(blind)
            import os as _os
            import time as _time
            dbg = _os.environ.get("HALO2_TPU_STEP_TIMINGS") == "1"
            t0 = _time.time()
            cols = F.encode_ints_cols(col_vals)            # (m, n, L)
            if dbg:
                jax.block_until_ready(cols)
                print(f"    [commit_phase] encode: {_time.time()-t0:.2f}s",
                      flush=True)
                t0 = _time.time()
            from ..commit.kzg import PreMSM
            pre = PreMSM(self.params.curve)    # batch-normalization collector
            for j in range(len(column_indices)):
                pre.append_term(1, self.params.commit_lagrange(
                    Poly.lagrange(cols[j]), blinds[j]))
            if dbg:
                jax.block_until_ready(pre.points)
                print(f"    [commit_phase] msms: {_time.time()-t0:.2f}s",
                      flush=True)
                t0 = _time.time()
            for pt in pre.normalize():
                # [TRANSCRIPT-3]
                self.transcript.write_point(pt)
            if dbg:
                print(f"    [commit_phase] normalize+write: "
                      f"{_time.time()-t0:.2f}s", flush=True)
                t0 = _time.time()
            idx = jnp.asarray(column_indices)
            self.advice_values[circ] = \
                self.advice_values[circ].at[idx].set(cols)
            if dbg:
                jax.block_until_ready(self.advice_values[circ])
                print(f"    [commit_phase] set: {_time.time()-t0:.2f}s",
                      flush=True)
            for j, ci in enumerate(column_indices):
                self.advice_blinds[circ][ci] = blinds[j]

        # [TRANSCRIPT-4]
        for index, ch_phase in enumerate(cs.challenge_phase):
            if ch_phase == phase:
                assert index not in self.challenges
                self.challenges[index] = self.transcript.squeeze_challenge()

        self.next_phase_index += 1
        return dict(self.challenges)

    # ------------------------------------------------------------------

    def _tick(self, name: str):
        """Record wall time since the previous tick under `name`.  The
        transcript's host fetches make the prover synchronous at every
        commitment boundary; tick boundaries that are NOT commitment
        boundaries (T13/T14) must first call `_sync` on the step's output,
        or the dispatched-but-unfinished device work gets billed to the
        next step ([TRANSCRIPT-N] table; SURVEY §5.1 profiling
        methodology; VERDICT r4 weak #4)."""
        import time
        now = time.time()
        if getattr(self, "_t_last", None) is not None:
            self.timings[name] = self.timings.get(name, 0.0) + (
                now - self._t_last)
        self._t_last = now

    @staticmethod
    def _sync(x):
        """Force completion of the device computation producing `x`.  A
        one-element fetch, not block_until_ready: the remote-TPU tunnel
        treats block_until_ready as a no-op, so a tiny host fetch is the
        only honest synchronization point."""
        import numpy as np
        if x is not None:
            np.asarray(jax.tree.leaves(x)[0].ravel()[:1])

    def _scope(self, name: str):
        """jax.profiler named scope per [TRANSCRIPT-N] step (SURVEY §5.1):
        device ops dispatched inside show up under halo2[...] in a
        `jax.profiler.trace` capture."""
        return jax.profiler.TraceAnnotation(f"halo2[{name}]")

    def create_proof(self):
        import time
        F = self.F
        p = F.p
        self.timings = getattr(self, "timings", {})
        self._t_last = time.time()
        pk = self.pk
        params = self.params
        cs_back = pk.vk.cs
        cs = cs_back.cs
        domain = pk.vk.domain
        n = domain.n
        bf = cs_back.blinding_factors()
        rng = self.rng
        t = self.transcript
        n_circ = len(self.instance_values)

        challenges = [self.challenges[i] for i in range(cs.num_challenges)]
        challenges_enc = [F.encode_int(c) for c in challenges]

        # [TRANSCRIPT-5] theta
        theta = t.squeeze_challenge()

        # [TRANSCRIPT-6] lookup permuted commitments
        permuted_lookups = []
        with self._scope("lookup_permute T5-6"):
            for c in range(n_circ):
                permuted_lookups.append([
                    self._lookup_commit_permuted(c, lk, theta, challenges_enc)
                    for lk in cs.lookups])

        self._tick('lookup_permute [T5-6]')
        # [TRANSCRIPT-7/8] beta, gamma
        beta = t.squeeze_challenge()
        gamma = t.squeeze_challenge()

        import os as _os
        _dbg = _os.environ.get("HALO2_TPU_STEP_TIMINGS") == "1"
        _t9 = time.time()
        # [TRANSCRIPT-9] permutation grand products
        with self._scope("permutation_commit T9"):
            permutations_z = [self._permutation_commit(c, beta, gamma)
                              for c in range(n_circ)]
        if _dbg:
            print(f"    [T9] permutation_commit: {time.time()-_t9:.2f}s",
                  flush=True)
            _t9 = time.time()

        # [TRANSCRIPT-10] lookup products
        lookups_committed = []
        with self._scope("lookup_product T10"):
            for c in range(n_circ):
                lookups_committed.append([
                    self._lookup_commit_product(pl, beta, gamma)
                    for pl in permuted_lookups[c]])
        if _dbg:
            print(f"    [T10] lookup_products: {time.time()-_t9:.2f}s",
                  flush=True)
            _t9 = time.time()
        # free the permuted-lookup LAGRANGE intermediates (compressed +
        # permuted columns): only the coeff polys inside lookups_committed
        # are needed from here on — at k=20 with 4 lookups these hold
        # ~1.6 GB of HBM through the h pass (the streamed-coset memory
        # discipline of evaluation.rs:486-498 applied to the prover state)
        permuted_lookups = None

        # [TRANSCRIPT-11] shuffle products
        shuffles_committed = []
        with self._scope("shuffle_product T11"):
            for c in range(n_circ):
                shuffles_committed.append([
                    self._shuffle_commit_product(c, sh, theta, gamma,
                                                 challenges_enc)
                    for sh in cs.shuffles])
        if _dbg:
            print(f"    [T11] shuffle_products: {time.time()-_t9:.2f}s",
                  flush=True)

        self._tick('grand_products [T9-11]')
        # [TRANSCRIPT-12] vanishing random poly — generated device-side from
        # an rng-derived seed (the reference parallelizes exactly this with
        # per-chunk ChaCha20 seeding, vanishing/prover.rs:55-85 /
        # benches/commit_zk.rs): draw 384 uniform bits per coefficient as
        # numpy uint16 limbs and reduce mod p on device as hi*2^192 + lo.
        with self._scope("vanishing_random T12"):
            random_poly = Poly.coeff(_random_poly_device(F, n, rng))
            random_blind = Blind(rng.randrange(p))
            t.write_point(params.commit_affine(random_poly, random_blind))

            # advice -> coeff form (basis-typed from here on); the lagrange
            # form is dead past this point — free it (k>=20 HBM budget)
            advice_polys = [
                domain.lagrange_to_coeff(Poly.lagrange(a)) if a.shape[0]
                else Poly.coeff(a) for a in self.advice_values]
            self.advice_values = None

        self._tick('vanishing_random [T12]')
        # [TRANSCRIPT-13] y; evaluate h
        y = t.squeeze_challenge()
        with self._scope("evaluate_h T13"):
            h_ext = pk.ev.evaluate_h(
                pk, advice_polys, self.instance_polys, challenges_enc,
                F.encode_int(y), F.encode_int(beta), F.encode_int(gamma),
                F.encode_int(theta),
                [[(lk["product_poly"], lk["permuted_input_poly"],
                   lk["permuted_table_poly"]) for lk in lkc]
                 for lkc in lookups_committed],
                [[sh["product_poly"] for sh in shc]
                 for shc in shuffles_committed],
                [[s["poly"] for s in pz] for pz in permutations_z])
            self._sync(h_ext)

        self._tick('evaluate_h [T13]')
        # [TRANSCRIPT-14] h pieces
        with self._scope("h_pieces T14"):
            h_ext = domain.divide_by_vanishing_poly(h_ext)
            h_coeff = domain.extended_to_coeff(h_ext)
            n_pieces = domain.quotient_poly_degree
            h_pieces = [h_coeff[i * n:(i + 1) * n] for i in range(n_pieces)]
            h_blinds = [Blind(rng.randrange(p)) for _ in range(n_pieces)]
            # batched normalization (PreMSM, kzg/msm.rs:96-137): commit each
            # piece on device, then ONE projective->affine conversion +
            # host fetch for all pieces
            from ..commit.kzg import PreMSM
            pre = PreMSM(params.curve)
            for piece, blind in zip(h_pieces, h_blinds):
                pre.append_term(1, params.commit(piece, blind))
            for pt in pre.normalize():
                t.write_point(pt)

        self._tick('h_pieces [T14]')
        # [TRANSCRIPT-15] x
        x = t.squeeze_challenge()
        xn = pow(x, n, p)

        def evalp(poly, point: int) -> int:
            return F.decode_int(
                eval_polynomial(F, poly, F.encode_int(point)))

        # [TRANSCRIPT-19] vanishing: fold h pieces by xn (the fold itself —
        # its eval is batched with the rest below)
        h_poly = None
        h_blind = 0
        for piece, blind in zip(reversed(h_pieces), reversed(h_blinds)):
            if h_poly is None:
                h_poly = piece
                h_blind = blind.value
            else:
                h_poly = Poly.coeff(F.add(
                    F.mul(h_poly.values, F.encode_int(xn)), piece.values))
                h_blind = (h_blind * xn + blind.value) % p
        import os as _os
        if _os.environ.get("HALO2_TPU_DEBUG"):
            print(f"[dbg prover] x={x:#x} h_poly(x)={evalp(h_poly, x):#x}")

        # [TRANSCRIPT-16..23] opening evaluations.  All opened polys are
        # length-n coefficient vectors; the requests are collected in exact
        # transcript order, grouped by point, and each distinct point costs
        # ONE fused device dispatch + host fetch (eval_polys_at_points) —
        # previously one Horner + fetch per query, ~30-60 round-trips
        # through the ~30ms tunnel (round-2 VERDICT weak #8; reference
        # parallel Horner: arithmetic.rs:57-82).
        from ..poly.arith import eval_polys_at_points
        x_next = domain.rotate_omega_int(x, Rotation(1))
        x_last = domain.rotate_omega_int(x, Rotation(-(bf + 1)))
        x_prev = domain.rotate_omega_int(x, Rotation(-1))
        m = len(cs.permutation.columns)
        reqs = []

        # [TRANSCRIPT-16] instance evals (QUERY_INSTANCE schemes only)
        if self.query_instance:
            for c in range(n_circ):
                for column, at in cs_back.instance_queries:
                    reqs.append((self.instance_polys[c][column.index],
                                 domain.rotate_omega_int(x, at)))
        # [TRANSCRIPT-17] advice evals
        for c in range(n_circ):
            for column, at in cs_back.advice_queries:
                reqs.append((advice_polys[c][column.index],
                             domain.rotate_omega_int(x, at)))
        # [TRANSCRIPT-18] fixed evals
        for column, at in cs_back.fixed_queries:
            reqs.append((pk.fixed_polys[column.index],
                         domain.rotate_omega_int(x, at)))
        # [TRANSCRIPT-19] random poly eval
        reqs.append((random_poly, x))
        # [TRANSCRIPT-20] sigma evals
        for j in range(m):
            reqs.append((pk.permutation.polys[j], x))
        # [TRANSCRIPT-21] permutation z evals
        for c in range(n_circ):
            sets = permutations_z[c]
            for si, s in enumerate(sets):
                reqs.append((s["poly"], x))
                reqs.append((s["poly"], x_next))
                if si < len(sets) - 1:
                    reqs.append((s["poly"], x_last))
        # [TRANSCRIPT-22] lookup evals
        for c in range(n_circ):
            for lk in lookups_committed[c]:
                reqs.append((lk["product_poly"], x))
                reqs.append((lk["product_poly"], x_next))
                reqs.append((lk["permuted_input_poly"], x))
                reqs.append((lk["permuted_input_poly"], x_prev))
                reqs.append((lk["permuted_table_poly"], x))
        # [TRANSCRIPT-23] shuffle evals
        for c in range(n_circ):
            for sh in shuffles_committed[c]:
                reqs.append((sh["product_poly"], x))
                reqs.append((sh["product_poly"], x_next))

        for v in eval_polys_at_points(F, reqs):
            t.write_scalar(v)

        self._tick('evals [T15-23]')
        # 13. assemble prover queries (prover.rs:840-889)
        queries: List[ProverQuery] = []
        for c in range(n_circ):
            if self.query_instance:
                inst_refs = {}
                for column, at in cs_back.instance_queries:
                    if column.index not in inst_refs:
                        inst_refs[column.index] = PolyRef(
                            self.instance_polys[c][column.index], Blind(1))
                    queries.append(ProverQuery(
                        domain.rotate_omega_int(x, at),
                        inst_refs[column.index]))
            adv_refs = {}
            for column, at in cs_back.advice_queries:
                if column.index not in adv_refs:
                    adv_refs[column.index] = PolyRef(
                        advice_polys[c][column.index],
                        self.advice_blinds[c][column.index])
                queries.append(ProverQuery(
                    domain.rotate_omega_int(x, at), adv_refs[column.index]))
            # permutation sets
            sets = permutations_z[c]
            set_refs = [PolyRef(s["poly"], s["blind"]) for s in sets]
            for ref in set_refs:
                queries.append(ProverQuery(x, ref))
                queries.append(ProverQuery(x_next, ref))
            for ref in reversed(set_refs[:-1]):
                queries.append(ProverQuery(x_last, ref))
            # lookups
            for lk in lookups_committed[c]:
                prod = PolyRef(lk["product_poly"], lk["product_blind"])
                pin = PolyRef(lk["permuted_input_poly"],
                              lk["permuted_input_blind"])
                ptab = PolyRef(lk["permuted_table_poly"],
                               lk["permuted_table_blind"])
                queries += [ProverQuery(x, prod), ProverQuery(x, pin),
                            ProverQuery(x, ptab), ProverQuery(x_prev, pin),
                            ProverQuery(x_next, prod)]
            # shuffles
            for sh in shuffles_committed[c]:
                prod = PolyRef(sh["product_poly"], sh["product_blind"])
                queries += [ProverQuery(x, prod), ProverQuery(x_next, prod)]
        # fixed columns
        fixed_refs = {}
        for column, at in cs_back.fixed_queries:
            if column.index not in fixed_refs:
                fixed_refs[column.index] = PolyRef(
                    pk.fixed_polys[column.index], Blind(1))
            queries.append(ProverQuery(
                domain.rotate_omega_int(x, at), fixed_refs[column.index]))
        # sigma polys
        for j in range(m):
            queries.append(ProverQuery(
                x, PolyRef(pk.permutation.polys[j], Blind(1))))
        # h and random poly
        queries.append(ProverQuery(x, PolyRef(h_poly, Blind(h_blind))))
        queries.append(ProverQuery(x, PolyRef(random_poly, random_blind)))

        return queries

    # ------------------------------------------------------------------
    # argument helpers
    # ------------------------------------------------------------------

    def _eval_lagrange(self, circ: int, expr, challenges_enc):
        """Evaluate an expression over the base lagrange domain."""
        F = self.F
        return evaluate_expression(
            F, expr, fixed=self.pk.fixed_values,
            advice=self.advice_values[circ],
            instance=self.instance_values[circ],
            challenges={i: e for i, e in enumerate(challenges_enc)},
            rot_scale=1)

    def _compress(self, circ, exprs, theta_enc, challenges_enc):
        F = self.F
        acc = F.zeros((self.pk.vk.domain.n,))
        for e in exprs:
            acc = F.add(F.mul(acc, theta_enc),
                        self._eval_lagrange(circ, e, challenges_enc))
        return acc

    def _lookup_commit_permuted(self, circ, lk_arg, theta, challenges_enc):
        """lookup/prover.rs:64-173 + permute_expression_pair :410-494."""
        F = self.F
        p = F.p
        pk = self.pk
        domain = pk.vk.domain
        n = domain.n
        bf = pk.vk.cs.blinding_factors()
        usable = n - (bf + 1)
        rng = self.rng
        theta_enc = F.encode_int(theta)

        comp_in = self._compress(circ, lk_arg.input_expressions, theta_enc,
                                 challenges_enc)
        comp_tab = self._compress(circ, lk_arg.table_expressions, theta_enc,
                                  challenges_enc)

        import os
        use_host = os.environ.get("HALO2_TPU_HOST_LOOKUP") == "1"
        if not use_host:
            # device sort-based permute (plonk/lookup_sort.py), bit-identical
            # to the host reference logic below
            from .lookup_sort import permute_expression_pair_device
            a_dev, s_dev = permute_expression_pair_device(
                F, comp_in, comp_tab, usable)
        if use_host or _sanity_on():
            in_ints = F.decode_ints(comp_in)[:usable]
            tab_ints = F.decode_ints(comp_tab)[:usable]

            perm_in = sorted(in_ints)
            leftover: Dict[int, int] = {}
            for v in tab_ints:
                leftover[v] = leftover.get(v, 0) + 1
            perm_tab = [0] * usable
            repeated_rows = []
            for row, v in enumerate(perm_in):
                if row == 0 or v != perm_in[row - 1]:
                    perm_tab[row] = v
                    if leftover.get(v, 0) > 0:
                        leftover[v] -= 1
                    else:
                        raise ValueError(
                            f"lookup '{lk_arg.name}': input {v} not in table")
                else:
                    repeated_rows.append(row)
            for v in sorted(leftover):
                for _ in range(leftover[v]):
                    perm_tab[repeated_rows.pop()] = v
            assert not repeated_rows

        if _sanity_on():
            # lookup/prover.rs:475-488: A'[i] == S'[i] or A'[i] == A'[i-1]
            for i in range(usable):
                assert perm_in[i] == perm_tab[i] or (
                    i > 0 and perm_in[i] == perm_in[i - 1]), \
                    f"permuted-pair invariant broken at row {i}"
            if not use_host:
                # device/host cross-check (VERDICT item 6 done-criterion)
                assert F.decode_ints(a_dev) == perm_in, \
                    "device permuted input != host"
                assert F.decode_ints(s_dev) == perm_tab, \
                    "device permuted table != host"

        blind_in = F.encode_ints([rng.randrange(p) for _ in range(bf + 1)])
        blind_tab = F.encode_ints([rng.randrange(p) for _ in range(bf + 1)])
        if use_host:
            permuted_input = jnp.concatenate(
                [F.encode_ints(perm_in), blind_in], axis=0)
            permuted_table = jnp.concatenate(
                [F.encode_ints(perm_tab), blind_tab], axis=0)
        else:
            permuted_input = jnp.concatenate([a_dev, blind_in], axis=0)
            permuted_table = jnp.concatenate([s_dev, blind_tab], axis=0)

        in_blind = Blind(rng.randrange(p))
        tab_blind = Blind(rng.randrange(p))
        permuted_input = Poly.lagrange(permuted_input)
        permuted_table = Poly.lagrange(permuted_table)
        self.transcript.write_point(
            self.params.commit_affine_lagrange(permuted_input, in_blind))
        self.transcript.write_point(
            self.params.commit_affine_lagrange(permuted_table, tab_blind))

        return {
            "compressed_input": comp_in, "compressed_table": comp_tab,
            "permuted_input": permuted_input.values,
            "permuted_table": permuted_table.values,
            "permuted_input_poly": domain.lagrange_to_coeff(permuted_input),
            "permuted_table_poly": domain.lagrange_to_coeff(permuted_table),
            "permuted_input_blind": in_blind,
            "permuted_table_blind": tab_blind,
        }

    def _lookup_commit_product(self, pl, beta, gamma):
        """lookup/prover.rs:182-324."""
        F = self.F
        p = F.p
        pk = self.pk
        domain = pk.vk.domain
        n = domain.n
        bf = pk.vk.cs.blinding_factors()
        rng = self.rng
        b_enc, g_enc = F.encode_int(beta), F.encode_int(gamma)

        denom = F.mul(F.add(pl["permuted_input"], b_enc),
                      F.add(pl["permuted_table"], g_enc))
        denom_inv = F.batch_inv(denom)
        numer = F.mul(F.add(pl["compressed_input"], b_enc),
                      F.add(pl["compressed_table"], g_enc))
        product = F.mul(numer, denom_inv)

        cum = prefix_product(F, product)
        z = jnp.concatenate([F.ones((1,)), cum], axis=0)[: n - bf]

        if _sanity_on():
            # lookup/prover.rs:269-305: z telescopes back to 1 at u =
            # usable_rows, and each step satisfies the product relation.
            u = n - (bf + 1)
            z_ints = F.decode_ints(z)
            assert z_ints[0] == 1
            assert z_ints[u] == 1, "lookup grand product does not telescope"
            ai = F.decode_ints(pl["compressed_input"])
            si = F.decode_ints(pl["compressed_table"])
            pin = F.decode_ints(pl["permuted_input"])
            ptab = F.decode_ints(pl["permuted_table"])
            for i in range(u):
                left = z_ints[i + 1] * (pin[i] + beta) % p                     * ((ptab[i] + gamma) % p) % p
                right = z_ints[i] * ((ai[i] + beta) % p) % p                     * ((si[i] + gamma) % p) % p
                assert left == right, f"lookup product relation at row {i}"

        z = Poly.lagrange(jnp.concatenate(
            [z, F.encode_ints([rng.randrange(p) for _ in range(bf)])], axis=0))

        blind = Blind(rng.randrange(p))
        self.transcript.write_point(
            self.params.commit_affine_lagrange(z, blind))
        return {
            "product_poly": domain.lagrange_to_coeff(z),
            "product_blind": blind,
            "permuted_input_poly": pl["permuted_input_poly"],
            "permuted_table_poly": pl["permuted_table_poly"],
            "permuted_input_blind": pl["permuted_input_blind"],
            "permuted_table_blind": pl["permuted_table_blind"],
        }

    def _permutation_commit(self, circ, beta, gamma):
        """permutation/prover.rs:50-197; returns list of sets."""
        F = self.F
        p = F.p
        pk = self.pk
        cs = pk.vk.cs.cs
        domain = pk.vk.domain
        n = domain.n
        bf = pk.vk.cs.blinding_factors()
        rng = self.rng
        columns = cs.permutation.columns
        if not columns:
            return []
        chunk_len = pk.vk.cs_degree - 2
        b_enc, g_enc = F.encode_int(beta), F.encode_int(gamma)
        omega_pows = powers(F, F.encode_int(domain.omega), n)
        kind_map = {ADVICE: self.advice_values[circ],
                    FIXED: pk.fixed_values,
                    INSTANCE: self.instance_values[circ]}

        sets = []
        last_z = 1
        delta_power = 0   # global column counter for delta powers
        for ci in range(0, len(columns), chunk_len):
            chunk = columns[ci: ci + chunk_len]
            modified = F.ones((n,))
            for j, col in enumerate(chunk):
                vals = kind_map[col.kind][col.index]
                sigma = pk.permutation.permutations[ci + j]
                modified = F.mul(modified, F.add(F.add(
                    F.mul(b_enc, sigma), g_enc), vals))
            modified = F.batch_inv(modified)
            for j, col in enumerate(chunk):
                vals = kind_map[col.kind][col.index]
                deltaomega = F.mul(omega_pows, F.encode_int(
                    pow(F.delta, delta_power, p)))
                modified = F.mul(modified, F.add(F.add(
                    F.mul(deltaomega, b_enc), g_enc), vals))
                delta_power += 1

            if self.mesh is not None:
                from ..dist.scan import sharded_prefix_product
                cum = sharded_prefix_product(self.mesh, F, modified)
            else:
                cum = prefix_product(F, modified)
            z = jnp.concatenate(
                [F.encode_ints([last_z]),
                 F.mul(cum[:-1], F.encode_int(last_z))], axis=0)
            # blinding rows
            blind_rows = F.encode_ints(
                [rng.randrange(p) for _ in range(bf)])
            z = jnp.concatenate([z[: n - bf], blind_rows], axis=0)
            last_z = F.decode_int(z[n - (bf + 1)])

            blind = Blind(rng.randrange(p))
            z = Poly.lagrange(z)
            self.transcript.write_point(
                self.params.commit_affine_lagrange(z, blind))
            sets.append({"poly": domain.lagrange_to_coeff(z), "blind": blind})
        return sets

    def _shuffle_commit_product(self, circ, sh_arg, theta, gamma,
                                challenges_enc):
        """shuffle/prover.rs:97-211."""
        F = self.F
        p = F.p
        pk = self.pk
        domain = pk.vk.domain
        n = domain.n
        bf = pk.vk.cs.blinding_factors()
        rng = self.rng
        theta_enc = F.encode_int(theta)
        g_enc = F.encode_int(gamma)

        comp_in = self._compress(circ, sh_arg.input_expressions, theta_enc,
                                 challenges_enc)
        comp_sh = self._compress(circ, sh_arg.shuffle_expressions, theta_enc,
                                 challenges_enc)
        product = F.mul(F.add(comp_in, g_enc),
                        F.batch_inv(F.add(comp_sh, g_enc)))
        cum = prefix_product(F, product)
        z = jnp.concatenate([F.ones((1,)), cum], axis=0)[: n - bf]
        z = Poly.lagrange(jnp.concatenate(
            [z, F.encode_ints([rng.randrange(p) for _ in range(bf)])], axis=0))
        blind = Blind(rng.randrange(p))
        self.transcript.write_point(
            self.params.commit_affine_lagrange(z, blind))
        return {"product_poly": domain.lagrange_to_coeff(z),
                "product_blind": blind}

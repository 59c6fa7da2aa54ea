"""Re-derive the pasta hash-to-curve isogeny constants from first principles.

pasta_curves' SSWU suite maps onto a 3-isogenous curve E' and applies a
degree-3 isogeny back to the target curve E: y^2 = x^3 + 5.  The crate pins
(ISO_A, ISO_B, Z, THETA, 13 isogeny-map constants) without derivation; this
tool reconstructs them:

 1. Enumerate the curves 3-isogenous to E via Velu's formulas (kernels are
    the rational roots of the 3-division polynomial psi_3 = 3x(x^3 + 4b)).
 2. For each image j-invariant, scan b' = 1, 2, ... for the smallest b'
    such that E'(a', b') with j(E') = j_image is isomorphic over F_p to the
    image (this reproduces the "small-b" normalization the published
    constants exhibit, e.g. secp256k1's iso-b = 1771 in the IETF suite).
 3. For each candidate E', find the kernel x0 on E' whose Velu image has
    a-coefficient 0, i.e. x0^2 = -3a'/10, then compose with the scaling
    (x, y) -> (v^2 x, v^3 y), v^6 = 5/B_velu, to land exactly on E.
 4. The remaining discrete freedom (cube root of a', 6th-root multiplier
    on v) is resolved EMPIRICALLY against the reference's golden
    pinned-vk: with IPA blinds defaulting to ONE, the all-zero `sf` fixed
    column commits to exactly w = hash_to_curve("Halo2-Parameters")([1]),
    which the reference pins at plonk_api.rs:1117 (Vesta).

Writes halo2_tpu/curves/iso_constants.py with the matching spec(s).
"""

import itertools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from halo2_tpu.curves.hash_to_curve import (  # noqa: E402
    IsoSpec, ec_add, ec_mul, hash_to_curve, is_on_curve, iso_map,
    theta_for, _sqrt,
)

# pasta moduli (pallas base Fp == vesta scalar; vesta base Fq == pallas scalar)
P_PALLAS = 0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001
P_VESTA = 0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001
B = 5
GENERATOR = 5  # multiplicative generator of both fields

# the reference's golden w point for Vesta (plonk_api.rs:1117 —
# fixed_commitments[0] = commit(all-zero sf column, Blind::default()=1) = w)
GOLDEN_W_VESTA = (
    0x2BBC94EF7B22AEBEF24F9A4B0CC1831882548B605171366017D45C3E6FD92075,
    0x082B801A6E176239943BFB759FB02138F47A5C8CC4AA7FA0AF559FDE4E3ABD97,
)


def cube_roots(p, a):
    """All cube roots of a mod p via Adleman-Manders-Miller (p = 1 mod 3)."""
    a %= p
    if a == 0:
        return [0]
    if pow(a, (p - 1) // 3, p) != 1:
        return []
    # p - 1 = 3^s * t with 3 not dividing t
    t = p - 1
    s = 0
    while t % 3 == 0:
        t //= 3
        s += 1
    c = pow(GENERATOR, t, p)          # generates the 3-Sylow (order 3^s)
    # initial guess x0 with x0^3 = a * a^t-ish error in the Sylow subgroup
    if t % 3 == 2:
        x = pow(a, (t + 1) // 3, p)   # x^3 = a^(t+1) = a * a^t
    else:                             # t % 3 == 1
        x = pow(a, (2 * t + 1) // 3, p)  # x^3 = a * a^(2t)
    err = pow(x, 3, p) * pow(a, p - 2, p) % p   # in <c>
    # Pohlig-Hellman base 3: err = c^e, then multiply x by c^(-e/3)
    e = 0
    c_inv = pow(c, p - 2, p)
    top = pow(c, 3 ** (s - 1), p)     # order-3 element
    for i in range(s):
        w = pow(err * pow(c_inv, e, p) % p, 3 ** (s - 1 - i), p)
        if w == 1:
            d = 0
        elif w == top:
            d = 1
        else:
            d = 2
        e += d * (3 ** i)
    assert pow(c, e, p) == err
    assert e % 3 == 0, "a is a cube but Sylow dlog not divisible by 3?"
    x = x * pow(c_inv, e // 3, p) % p
    assert pow(x, 3, p) == a
    zeta = pow(GENERATOR, (p - 1) // 3, p)
    return [x, x * zeta % p, x * zeta * zeta % p]


def velu_image_from_E(p, b):
    """3-isogeny image curves from E: y^2 = x^3 + b (excluding j=0 images).
    Returns [(A_im, B_im, x0)]."""
    out = []
    for x0 in cube_roots(p, (-4 * b) % p):
        if x0 == 0:
            continue
        t = 6 * x0 * x0 % p
        u = 4 * (x0 * x0 % p * x0 + b) % p
        w = (u + x0 * t) % p
        A = (-5 * t) % p
        Bi = (b - 7 * w) % p
        out.append((A, Bi, x0))
    return out


def j_invariant(p, a, b):
    num = 1728 * 4 * pow(a, 3, p) % p
    den = (4 * pow(a, 3, p) + 27 * b * b) % p
    return num * pow(den, p - 2, p) % p


def iso_curve_candidates(p, b, b_limit=100000):
    """Smallest-b' curves isomorphic to each 3-isogeny image."""
    results = []
    for A_im, B_im, _x0 in velu_image_from_E(p, b):
        j = j_invariant(p, A_im, B_im)
        assert j not in (0, 1728 % p)
        # the direct Velu image itself (u = 1) — the parameterization the
        # pasta constants use (iso-b = 1265 = 5 - 7*(-180) for both curves)
        results.append((B_im, [A_im], (A_im, B_im)))
        for b_prime in range(1, b_limit):
            # j = 1728*4a^3/(4a^3+27b^2)  =>  a^3 = 27 j b'^2 / (4(1728-j))
            a3 = 27 * j % p * b_prime % p * b_prime % p \
                * pow(4 * (1728 - j) % p, p - 2, p) % p
            roots = cube_roots(p, a3)
            valid = []
            for a_prime in roots:
                if a_prime == 0:
                    continue
                u4 = a_prime * pow(A_im, p - 2, p) % p
                u6 = b_prime * pow(B_im, p - 2, p) % p
                u2 = u6 * pow(u4, p - 2, p) % p
                if u2 * u2 % p == u4 and pow(u2, 3, p) == u6 \
                        and pow(u2, (p - 1) // 2, p) == 1:
                    valid.append(a_prime)
            if valid:
                results.append((b_prime, valid, (A_im, B_im)))
                break
    return results


def isogeny_specs(p, b, curve_id, z=-13):
    """Enumerate full candidate IsoSpecs (all discrete choices)."""
    z %= p
    # root of unity for sqrt_ratio: generator^t (2-adic)
    t_odd = p - 1
    while t_odd % 2 == 0:
        t_odd //= 2
    root_of_unity = pow(GENERATOR, t_odd, p)
    theta = theta_for(p, root_of_unity, z)
    zeta = pow(GENERATOR, (p - 1) // 3, p)

    specs = []
    for b_prime, a_candidates, _img in iso_curve_candidates(p, b):
        for a_prime in a_candidates:
            # kernel on E' with Velu image a-coeff zero: x0^2 = -3a'/10
            x0sq = (-3 * a_prime) % p * pow(10, p - 2, p) % p
            x0r = _sqrt(p, x0sq)
            if x0r is None:
                continue
            for x0 in (x0r, p - x0r):
                # check x0 is a root of psi_3
                psi = (3 * pow(x0, 4, p) + 6 * a_prime * x0 * x0
                       + 12 * b_prime * x0 - a_prime * a_prime) % p
                if psi != 0:
                    continue
                t = (6 * x0 * x0 + 2 * a_prime) % p
                g0 = (pow(x0, 3, p) + a_prime * x0 + b_prime) % p
                u = 4 * g0 % p
                B_vel = (b_prime - 7 * (u + x0 * t)) % p
                v6 = b * pow(B_vel, p - 2, p) % p
                # v = 6th root: v^2 is a cube root of v6 that is square
                for v2 in cube_roots(p, v6):
                    v = _sqrt(p, v2)
                    if v is None:
                        continue
                    for mu in (1, p - 1):
                        vv = v * mu % p
                        iso = _build_constants(p, x0, t, u, vv)
                        spec = IsoSpec(curve_id, p, b, a_prime, b_prime,
                                       z, root_of_unity, theta, iso)
                        if _check_isogeny(spec):
                            specs.append(spec)
    return specs


def _build_constants(p, x0, t, u, v):
    v2 = v * v % p
    v3 = v2 * v % p
    return (
        v2,
        v2 * (-2 * x0) % p,
        v2 * (x0 * x0 + t) % p,
        v2 * (u - t * x0) % p,
        (-2 * x0) % p,
        x0 * x0 % p,
        v3,
        v3 * (-3 * x0) % p,
        v3 * (3 * x0 * x0 - t) % p,
        v3 * (t * x0 - pow(x0, 3, p) - 2 * u) % p,
        (-3 * x0) % p,
        3 * x0 * x0 % p,
        (-pow(x0, 3, p)) % p,
    )


def _rand_point(p, a, b, seed):
    x = seed
    while True:
        y = _sqrt(p, (pow(x, 3, p) + a * x + b) % p)
        if y is not None:
            return (x, y)
        x += 1


def _apply(spec, P):
    x, y = P
    pt = iso_map(spec, (x, y, 1))
    from halo2_tpu.curves.hash_to_curve import _jac_to_affine
    return _jac_to_affine(spec.p, pt)


def _check_isogeny(spec):
    """Numeric check: on-curve + homomorphism on random points of E'."""
    p, a, b = spec.p, spec.iso_a, spec.iso_b
    P = _rand_point(p, a, b, 1234567)
    Q = _rand_point(p, a, b, 7654321)
    fP, fQ = _apply(spec, P), _apply(spec, Q)
    if fP is None or fQ is None:
        return False
    if not (is_on_curve(p, 0, spec.b, fP) and is_on_curve(p, 0, spec.b, fQ)):
        return False
    lhs = _apply(spec, ec_add(p, a, P, Q))
    rhs = ec_add(p, 0, fP, fQ)
    return lhs == rhs


def _dedup(specs):
    seen = {}
    for s in specs:
        seen.setdefault((s.iso_a, s.iso_b) + s.isogeny, s)
    return list(seen.values())


def _same_function(specs, domain_prefix="Halo2-Parameters", n_msgs=48):
    """True if all specs hash every probe message to the same point."""
    import hashlib as _h
    msgs = [b"\x01", b"\x02"] + [
        b"\x00" + i.to_bytes(4, "little") for i in range(16)] + [
        _h.sha256(bytes([i])).digest() for i in range(n_msgs - 18)]
    hs = [hash_to_curve(s, domain_prefix) for s in specs]
    for m in msgs:
        pts = {h(m) for h in hs}
        if len(pts) != 1:
            return False
    return True


def _emit(path, vesta_spec, pallas_specs, pallas_pick):
    lines = [
        '\"\"\"Pinned pasta hash-to-curve isogeny constants.',
        '',
        'AUTO-GENERATED by tools/derive_iso.py (Velu-derived, see that file',
        'for the construction).  The VESTA spec is verified byte-compatible',
        'with the reference: hash_to_curve("Halo2-Parameters")([1]) equals',
        'the golden pinned-vk w point (plonk_api.rs:1117) and the full',
        'pinned-vk commitment set matches (tests/test_pinned_vk.py).',
        '',
        'PALLAS has no reference-pinned artifact (the reference test suite',
        'instantiates IPA only over EqAffine/Vesta); the candidate classes',
        'differ by composition with curve automorphisms.  PALLAS_ISO pins',
        'class %d — the unique class whose x0-free coefficients equal the'
        % pallas_pick,
        'small-rational fingerprint (1/9, 380/9, 1/27, -940/27, -540) that',
        'the golden-verified VESTA map exhibits (both curves share one',
        'rational isogeny formula).  Swap the index if an external vector',
        'ever disagrees.',
        '\"\"\"',
        '',
        'from .hash_to_curve import IsoSpec',
        '',
    ]

    def spec_lit(s, name):
        iso = ",\n        ".join(f"0x{c:064x}" for c in s.isogeny)
        return (f"{name} = IsoSpec(\n"
                f"    curve_id=\"{s.curve_id}\",\n"
                f"    p=0x{s.p:064x},\n"
                f"    b={s.b},\n"
                f"    iso_a=0x{s.iso_a:064x},\n"
                f"    iso_b={s.iso_b},\n"
                f"    z=0x{s.z:064x},  # -13\n"
                f"    root_of_unity=0x{s.root_of_unity:064x},\n"
                f"    theta=0x{s.theta:064x},\n"
                f"    isogeny=(\n        {iso},\n    ),\n)")

    lines.append(spec_lit(vesta_spec, "VESTA_ISO"))
    lines.append("")
    for i, s in enumerate(pallas_specs):
        lines.append(spec_lit(s, f"_PALLAS_CLASS_{i}"))
        lines.append("")
    lines.append("PALLAS_CLASSES = (%s)" % ", ".join(
        f"_PALLAS_CLASS_{i}" for i in range(len(pallas_specs))))
    lines.append(f"PALLAS_ISO = _PALLAS_CLASS_{pallas_pick}")
    lines.append("")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}")


def main():
    print("deriving vesta candidates ...")
    vesta_specs = _dedup(isogeny_specs(P_VESTA, B, "vesta"))
    print(f"  {len(vesta_specs)} distinct isogeny candidates")
    survivors = []
    for spec in vesta_specs:
        h = hash_to_curve(spec, "Halo2-Parameters")
        if h(b"\x01") == GOLDEN_W_VESTA:
            survivors.append(spec)
    print(f"  {len(survivors)} match the golden w point")
    if not survivors:
        print("NO MATCH - widen the search (Z, b-limit, conventions)")
        return 1
    # The single-point w oracle admits sign-pattern false positives; the
    # direct-Velu parameterization (iso_b = 1265, the published pasta
    # layout) is the pin.  tests/test_pinned_vk.py settles it end-to-end:
    # all 19 golden commitments depend on every g[i] and w.
    velu_direct = [s for s in survivors if s.iso_b == 1265]
    assert velu_direct, "no direct-Velu survivor"
    assert _same_function(velu_direct), \
        "direct-Velu kernels disagree pointwise?"
    vesta_pin = velu_direct[0]
    assert _pick_by_rational_fingerprint([vesta_pin]) == 0, \
        "golden-matching vesta class lacks the rational fingerprint?"
    print(f"  pinned: a'={vesta_pin.iso_a:#x} b'={vesta_pin.iso_b}")

    print("deriving pallas candidates ...")
    pallas_specs = _dedup(isogeny_specs(P_PALLAS, B, "pallas"))
    print(f"  {len(pallas_specs)} distinct candidates")
    # partition into pointwise classes
    classes = []
    for s in pallas_specs:
        placed = False
        for cl in classes:
            if _same_function([cl[0], s], n_msgs=20):
                cl.append(s)
                placed = True
                break
        if not placed:
            classes.append([s])
    print(f"  {len(classes)} pointwise-distinct classes")
    classes = [cl for cl in classes if any(s.iso_b == 1265 for s in cl)]
    print(f"  {len(classes)} classes contain a direct-Velu parameterization")
    reps = [next(s for s in cl if s.iso_b == 1265) for cl in classes]
    # Selection rule (validated on vesta against the golden oracle): the
    # true pasta map's x0-free coefficients are SMALL RATIONALS, identical
    # for both curves because they come from one rational isogeny formula:
    #   iso0 = 1/9, iso3 = 380/9, iso6 = 1/27, iso9 = -940/27, iso12 = -540
    pick = _pick_by_rational_fingerprint(reps)
    for i, s in enumerate(reps):
        print(f"    class {i}: a'={s.iso_a:#x} b'={s.iso_b}"
              + ("  <== rational fingerprint (pasta's map)"
                 if i == pick else ""))
    assert pick is not None, "no class has the rational fingerprint"
    _emit(pathlib.Path(__file__).resolve().parent.parent
          / "halo2_tpu/curves/iso_constants.py", vesta_pin, reps, pick)
    return 0


def _rat_recon(c, p, bound=10 ** 9):
    a, b = p, c % p
    x0, x1 = 0, 1
    while b:
        if abs(b) <= bound and abs(x1) <= bound:
            return (b, x1) if x1 > 0 else (-b, -x1)
        q = a // b
        a, b = b, a - q * b
        x0, x1 = x1, x0 - q * x1
    return None


FINGERPRINT = {0: (1, 9), 3: (380, 9), 6: (1, 27), 9: (-940, 27),
               12: (-540, 1)}


def _pick_by_rational_fingerprint(reps):
    for i, s in enumerate(reps):
        if all(_rat_recon(s.isogeny[k], s.p) == v
               for k, v in FINGERPRINT.items()):
            return i
    return None


if __name__ == "__main__":
    raise SystemExit(main())

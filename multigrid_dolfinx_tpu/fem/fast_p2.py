"""Device-side constant-coefficient P2 hierarchy construction.

The host P2 assembler (fem.assembly) materializes K ~ 51 stencil planes
per level and walks full grids; at the production lattice (256^3 cells =
513^3 = 135M DOFs, BASELINE config 4) those planes alone would cost
51 x 0.69 GB of HBM and minutes of host time.  But for CONSTANT kappa on
the uniform simplex mesh the P2 operator is exactly periodic: every
interior row depends only on the node's lattice parity class (vertex /
edge / face / body midpoint = the 2^d parities), because every interior
node sees the same incident-cell pattern; the only non-periodic raw rows
sit ON the domain faces.  So the whole operator is a (K, 4^d) table —
per-axis classes {low face, even interior, odd interior, high face} —
extracted ONCE from an exact host assembly of a tiny prototype grid and
rescaled per level (stiffness ~ h^(d-2), mass/load ~ h^d).  The device
builds b and g from iota coordinates and one table-stencil application
(the lifting), exactly the dolfinx assemble/apply_lifting/set_bc sequence
(reference Multigrid_prototype.py:95-110) without a single O(N) host
array.

Coarse levels are REDISCRETIZED (the same tables at 2h) — measured to
converge in the same cycle count as the Galerkin planes hierarchy for
constant-coefficient P2 (13 vs 14 V(2,2)-jacobi cycles at the 17^3
lattice), while staying plane-free at every level.
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ProblemSpec
from ..mesh import GridLevel

Offset = Tuple[int, ...]

# prototype grid: n0 elements per dim -> lattice lm0 = 2 n0 + 1 = 9.
# Representative lattice index per per-axis class {0: low face, 1: even
# interior, 2: odd interior, 3: high face}.  The interior representatives
# sit >= 3 lattice steps from every face, where raw rows are provably
# periodic and the load carries no lifting contribution.
_P2_N0 = 4
_CLS_REP = {0: 0, 1: 4, 2: 3, 3: 2 * _P2_N0}


@dataclasses.dataclass(frozen=True)
class P2Template:
    """O(1) host-side data for the device P2 builder (all extracted from
    one exact tiny-prototype assembly, unit-normalized in h)."""

    ndim: int
    diagonal: str
    offsets: Tuple[Offset, ...]           # stiffness offsets (radius 2)
    a_unit: np.ndarray                    # (K, 4^d) raw stiffness / h^(d-2)
    m_offsets: Tuple[Offset, ...]
    m_unit: np.ndarray                    # (K_m, 4^d) raw mass / h^d
    load_unit: np.ndarray                 # (4^d,) b_raw / (rhs_const h^d)
    rhs_const: float


def _class_nodes(ndim: int):
    """(flat class index, lattice node index tuple) for all 4^d classes."""
    out = []
    for combo in itertools.product(range(4), repeat=ndim):
        flat = 0
        for c in combo:
            flat = flat * 4 + c
        out.append((flat, tuple(_CLS_REP[c] for c in combo)))
    return out


def build_p2_template(problem: ProblemSpec) -> P2Template:
    if problem.degree != 2:
        raise ValueError("build_p2_template is the P2 path")
    if problem.kappa is not None:
        raise ValueError("device P2 build requires constant kappa "
                         "(variable kappa: host assembler)")
    if problem.rhs_const is None:
        raise ValueError("device P2 build requires a constant RHS")
    if problem.reaction != 0.0:
        raise ValueError("device P2 build does not cover reaction terms")
    from .assembly import assemble_level

    ndim = problem.ndim
    asm = assemble_level(GridLevel(level=0, ndim=ndim, n=_P2_N0), problem)
    h0 = 1.0 / _P2_N0
    ncls = 4 ** ndim
    K = len(asm.offsets)
    Km = len(asm.M_offsets)
    a = np.zeros((K, ncls))
    m = np.zeros((Km, ncls))
    load = np.zeros((ncls,))
    deep = all  # readability below
    for flat, node in _class_nodes(ndim):
        a[:, flat] = asm.A_raw_planes[(slice(None),) + node]
        m[:, flat] = asm.M_planes[(slice(None),) + node]
        if deep(2 * _P2_N0 > i > 0 for i in node):
            # interior rows only: the load at boundary rows is never used
            # (b = uD there), and the interior load is parity-periodic at
            # any depth (all incident cells exist), so the deep value is
            # exact for near-boundary interior rows too.
            load[flat] = asm.b[node] / (problem.rhs_const * h0 ** ndim)
    return P2Template(
        ndim=ndim,
        diagonal=problem.diagonal,
        offsets=tuple(map(tuple, asm.offsets)),
        a_unit=a / h0 ** (ndim - 2),
        m_offsets=tuple(map(tuple, asm.M_offsets)),
        m_unit=m / h0 ** ndim,
        load_unit=load,
        rhs_const=problem.rhs_const,
    )


def _parity_class(shape, lm: int):
    cls = None
    for axis in range(len(shape)):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        c = jnp.where(
            i == 0, 0,
            jnp.where(i == lm - 1, 3, jnp.where(i % 2 == 0, 1, 2)),
        )
        cls = c if cls is None else cls * 4 + c
    return cls


def _inbox(shape, lm: int):
    m = None
    for axis in range(len(shape)):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        ib = i <= lm - 1
        m = ib if m is None else m & ib
    return m


def _raw_table_apply(tables, offsets, lm: int, u: jax.Array) -> jax.Array:
    """(A_raw u) at interior rows via the parity tables — reads keep bc
    values (the lifting needs A_raw g with g supported ON the boundary)."""
    shape = u.shape
    cls = _parity_class(shape, lm)
    r = max(max(abs(c) for c in off) for off in offsets)
    up = jnp.pad(u, [(r, r)] * u.ndim)
    out = None
    for k, off in enumerate(offsets):
        sl = tuple(slice(r + o, r + o + s) for o, s in zip(off, shape))
        term = tables[k].reshape(-1)[cls] * up[sl]
        out = term if out is None else out + term
    return out


def device_p2_level_arrays(
    template: P2Template,
    n: int,
    problem: ProblemSpec,
    dtype,
    pad_points: Optional[Tuple[int, ...]] = None,
):
    """(b, g) for one P2 level entirely on device: g = u* at the lattice
    boundary from iota coordinates; b = rhs_const h^d load[parity]
    - (A_raw g) at interior rows, uD at bc rows (the dolfinx
    assemble/apply_lifting/set_bc sequence, Multigrid_prototype.py:95-110).
    """
    ndim = template.ndim
    lm = 2 * n + 1
    h = 1.0 / n
    shape = tuple(pad_points) if pad_points is not None else (lm,) * ndim
    exact_fn = problem.resolved_exact()
    dt = jnp.dtype(dtype)

    def build():
        delta = h / 2.0                       # lattice spacing
        coords = [
            jax.lax.broadcasted_iota(jnp.int32, shape, ax).astype(dt)
            * delta
            for ax in range(ndim)
        ]
        inbox = _inbox(shape, lm)
        from ..ops.operators import box_interior_mask

        interior = box_interior_mask(shape, lm)
        bc = inbox & (~interior)
        uD = jnp.asarray(exact_fn(*coords), dtype=dt)
        g = jnp.where(bc, uD, jnp.zeros(shape, dt))

        cls = _parity_class(shape, lm)
        loadw = jnp.asarray(template.load_unit, dtype=dt)[cls]
        b_raw = dt.type(template.rhs_const * h ** ndim) * loadw

        a_tables = np.asarray(template.a_unit * h ** (ndim - 2))
        # Lifting A_raw g from the LOGICAL grid's boundary values, not
        # the stored g: with cropped storage (pad_points smaller than
        # the logical grid — solver/hierarchy crop_storage) the
        # high-boundary node planes are not stored, yet their Dirichlet
        # values must still be lifted into the adjacent interior rows
        # (radius-2 stencil: TWO interior row planes per face).  The
        # lifting is O(surface): g is supported only on the boundary
        # shell, so A_raw g is nonzero only within 2 rows of a face —
        # computed face-by-face on 2D strips (a full-volume formulation
        # measured an 18.2 GB XLA program at the cropped 513^3 build,
        # 2.4 GB past HBM; this one is a few MB of plane temporaries).
        # Faces PARTITION the shell (a node on several faces belongs to
        # the lowest-axis one — the _p2_shell_delta_quad tmask rule), so
        # no edge/corner double counting.
        b = b_raw
        for ax in range(ndim):
            in_axes = [a2 for a2 in range(ndim) if a2 != ax]
            # planes live on the LOGICAL in-plane extent (cropped
            # storage drops the lm-1 columns, but a face's edge nodes
            # there still lift into stored interior rows)
            pshape = tuple(max(shape[a2], lm) for a2 in in_axes)
            piota = [jax.lax.broadcasted_iota(jnp.int32, pshape, pa)
                     for pa in range(ndim - 1)]
            pcls = [jnp.where(i2 == 0, 0,
                              jnp.where(i2 == lm - 1, 3,
                                        jnp.where(i2 % 2 == 0, 1, 2)))
                    for i2 in piota]
            for face in (0, lm - 1):
                pcoords = []
                for a2 in range(ndim):
                    if a2 == ax:
                        pcoords.append(jnp.full(pshape, face * delta, dt))
                    else:
                        pa = in_axes.index(a2)
                        pcoords.append(piota[pa].astype(dt) * delta)
                gplane = jnp.asarray(exact_fn(*pcoords), dtype=dt)
                own = None           # partition of the shell + box
                for pa, a2 in enumerate(in_axes):
                    i2 = piota[pa]
                    m = (((i2 >= 1) & (i2 <= lm - 2)) if a2 < ax
                         else ((i2 >= 0) & (i2 <= lm - 1)))
                    own = m if own is None else own & m
                gplane = jnp.where(own, gplane, jnp.zeros_like(gplane))
                for oax in (-2, -1, 0, 1, 2):
                    out_row = face - oax
                    if not (0 <= out_row <= lm - 1):
                        continue
                    if out_row >= shape[ax]:
                        continue     # cropped-away output plane
                    if out_row in (0, lm - 1):
                        continue     # bc row: overwritten with uD below
                    c_ax = 1 if out_row % 2 == 0 else 2
                    contrib = None
                    for k, off in enumerate(template.offsets):
                        if off[ax] != oax:
                            continue
                        flat = None      # flat 4^d class like _parity_class
                        for a2 in range(ndim):
                            c = (c_ax if a2 == ax
                                 else pcls[in_axes.index(a2)])
                            flat = c if flat is None else flat * 4 + c
                        wplane = jnp.asarray(
                            a_tables[k], dtype=dt).reshape(-1)[flat]
                        src = gplane
                        for pa, a2 in enumerate(in_axes):
                            o2 = off[a2]
                            if o2:
                                src = jnp.roll(src, -o2, axis=pa)
                                valid = ((piota[pa] + o2 >= 0)
                                         & (piota[pa] + o2 <= lm - 1))
                                src = jnp.where(valid, src,
                                                jnp.zeros_like(src))
                        term = wplane * src
                        contrib = term if contrib is None else (
                            contrib + term)
                    if contrib is None:
                        continue
                    # back to the stored in-plane extent
                    contrib = contrib[tuple(
                        slice(0, shape[a2]) for a2 in in_axes)]
                    sl = tuple(
                        slice(out_row, out_row + 1) if a2 == ax
                        else slice(None) for a2 in range(ndim))
                    b = b.at[sl].add(-jnp.expand_dims(contrib, ax))
        b = jnp.where(bc, uD, b)
        b = jnp.where(inbox, b, jnp.zeros(shape, dt))
        return b, g

    return jax.jit(build)()


def device_p2_lmax(A, iters: int = 40) -> jax.Array:
    """Power iteration for lambda_max(Dinv A) on the eliminated parity
    operator (Chebyshev spectral window)."""
    shape = A.shape
    dinv = A.dinv()

    def apply(x):
        return dinv * A.apply(x)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, A.parity_tables.dtype)
    x = x / jnp.linalg.norm(x)

    def body(_, carry):
        x, _ = carry
        y = apply(x)
        nrm = jnp.linalg.norm(y)
        return y / jnp.maximum(nrm, 1e-30), nrm

    _, lam = jax.lax.fori_loop(
        0, iters, body, (x, jnp.asarray(2.0, x.dtype)))
    return lam

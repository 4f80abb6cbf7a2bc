"""Device-resident linear operators in stencil-plane form.

The reference keeps every operator as a scipy CSR matrix and multiplies with
SuperLU-era sparse kernels (multigrid.py:48-56, SpMV at :226,:244).  CSR is a
gather-heavy layout that maps poorly to a TPU's vector unit; a structured-grid
FEM operator is instead stored here as K dense coefficient planes over the
node grid:

    (A u)[p] = sum_k planes[k][p] * u[p + offsets[k]]

which XLA compiles to K fused shifted elementwise multiply-adds — unit-stride
VPU work with no index traffic.  Boundary conditions are *baked into the
planes* at assembly time (rows/columns eliminated, identity diagonal), so
`apply` needs no masking and is branch-free.

Fast path: constant-coefficient rediscretized operators (the 5-point
P1-Poisson stencil and friends) have planes that are *constant on the
interior* with identity/zero boundary rows.  For those the planes are never
read at apply time — the stencil weights are compile-time constants and the
interior/boundary masks are computed from iota (index arithmetic, zero HBM
traffic), so a matvec touches only u itself.  That turns the smoother from
~10 HBM passes per sweep into ~3.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


Offset = Tuple[int, ...]


def box_interior_mask(shape: Tuple[int, ...], logical_m: int) -> jax.Array:
    """Interior = strictly inside the logical (logical_m)^d node box —
    excludes both the Dirichlet boundary and any sharding/tile padding.
    Built from broadcasted_iota: no stored mask, no memory traffic."""
    m = None
    for axis, s in enumerate(shape):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        g = (i >= 1) & (i <= logical_m - 2)
        m = g if m is None else m & g
    return m


def _shifted(up: jax.Array, off: Offset, shape, r: int) -> jax.Array:
    sl = tuple(slice(r + o, r + o + s) for o, s in zip(off, shape))
    return up[sl]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["planes", "class_tables", "parity_tables"],
    meta_fields=["offsets", "const_weights", "logical_m", "boundary_mode",
                 "grid_shape", "uniform_p1_mass", "parity_weights"],
)
@dataclasses.dataclass(frozen=True)
class StencilOperator:
    """Compact-stencil linear operator on a structured node grid.

    planes: (K, *grid_shape) array; offsets: K static integer offsets.
    Rows are grid points; entry k couples p -> p + offsets[k].

    const_weights (optional, static): per-offset interior weights when the
    operator is interior-constant; with it set, apply() uses the maskless
    fast path and never reads `planes`.  boundary_mode says what the
    non-interior rows do: 'identity' (Dirichlet-eliminated stiffness) or
    'zero' (R_omega = Dinv(A-D), whose bc rows vanish).

    At scale, const operators drop their planes entirely (planes=None,
    grid_shape carries the shape): a 7-point operator on a 100M-point grid
    then costs zero HBM.
    """

    planes: Optional[jax.Array]
    offsets: Tuple[Offset, ...]
    const_weights: Optional[Tuple[float, ...]] = None
    logical_m: Optional[int] = None
    boundary_mode: str = "identity"
    grid_shape: Optional[Tuple[int, ...]] = None
    # boundary-class-table mode (plane-free, non-eliminated operators whose
    # rows depend only on which domain faces clip the node's support —
    # e.g. the consistent mass matrix of a constant-coefficient level):
    # class_tables[k][flat 3^d class index] = plane value.
    class_tables: Optional[jax.Array] = None
    # Static certificate that this operator IS the consistent P1 mass of
    # the uniform simplicial grid with the given diagonal ('right' |
    # 'left'; None = unknown/other).  Lets norm kernels use the exact
    # per-simplex geometric quadratic form q = sum_T (V/20)[(sum r)^2 +
    # sum r^2] instead of generic table correlations (the values are a
    # consequence of the mesh, so the flag is set where the tables are
    # built from mass_class_tables and nowhere else).
    uniform_p1_mass: Optional[str] = None
    # parity-class-table mode (plane-free CONSTANT-coefficient P2): the
    # interior rows of a constant-kappa P2 operator on the half-step DOF
    # lattice are exactly periodic with period 2 (each lattice parity
    # class is one P2 node type — vertex / edge / face / body midpoint),
    # and the only non-periodic raw rows sit ON the domain faces.  So the
    # whole operator is parity_tables[k][flat 4^d class] with per-axis
    # classes {0: i == 0, 1: even interior, 2: odd interior, 3:
    # i == lm-1} — O(4^d * K) scalars where materialized planes would
    # cost K full grids (51 x 0.69 GB at a 513^3 lattice).
    # boundary_mode 'identity': Dirichlet-eliminated stiffness (bc reads
    # zeroed, bc rows identity).  'raw': the un-eliminated operator (the
    # consistent mass / lifting applies), rows and reads taken as-is
    # inside the logical box.
    parity_tables: Optional[jax.Array] = None
    # STATIC twin of parity_tables (nested (K, 4^d) float tuples) so the
    # Pallas kernels can bake the weights as compile-time immediates.
    parity_weights: Optional[Tuple[Tuple[float, ...], ...]] = None

    @property
    def ndim(self) -> int:
        return len(self.offsets[0])

    @property
    def shape(self) -> Tuple[int, ...]:
        if self.planes is not None:
            return tuple(self.planes.shape[1:])
        return tuple(self.grid_shape)

    @property
    def radius(self) -> int:
        return max(max(abs(c) for c in off) for off in self.offsets)

    @property
    def is_const(self) -> bool:
        return self.const_weights is not None

    @property
    def axis_only(self) -> bool:
        """True if every non-center offset touches exactly one axis — the
        stencil graph is then 2-colorable by coordinate-sum parity."""
        zero = (0,) * self.ndim
        return all(
            off == zero or sum(1 for c in off if c != 0) == 1
            for off in self.offsets
        )

    def center_index(self) -> int:
        return self.offsets.index((0,) * self.ndim)

    def _parity_class(self, shape) -> jax.Array:
        """Flat 4^d parity/boundary class index per node: per axis
        {0: low face, 1: even interior, 2: odd interior, 3: high face}."""
        lm = self.logical_m
        cls = None
        for axis in range(len(shape)):
            i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
            c = jnp.where(
                i == 0, 0,
                jnp.where(i == lm - 1, 3, jnp.where(i % 2 == 0, 1, 2)),
            )
            cls = c if cls is None else cls * 4 + c
        return cls

    def diag(self) -> jax.Array:
        if self.parity_tables is not None:
            cls = self._parity_class(self.shape)
            d = self.parity_tables[self.center_index()][cls]
            if self.boundary_mode == "identity":
                interior = box_interior_mask(self.shape, self.logical_m)
                return jnp.where(interior, d, jnp.ones_like(d))
            return d
        if self.planes is None:
            w = self.const_weights[self.center_index()]
            interior = box_interior_mask(self.shape, self.logical_m)
            return jnp.where(interior, w, 1.0)
        return self.planes[self.center_index()]

    def dinv(self) -> jax.Array:
        """1 / diag — for plane-free const operators this is synthesized
        from iota masks (no memory)."""
        if self.parity_tables is not None:
            d = self.diag()
            return jnp.where(d != 0, 1.0 / d, jnp.ones_like(d))
        if self.planes is None:
            w = self.const_weights[self.center_index()]
            interior = box_interior_mask(self.shape, self.logical_m)
            return jnp.where(interior, 1.0 / w, 1.0)
        return 1.0 / self.planes[self.center_index()]

    def drop_planes(self) -> "StencilOperator":
        """Release the planes of a const operator (keeps shape metadata)."""
        if not self.is_const:
            raise ValueError("cannot drop planes of a non-const operator")
        return dataclasses.replace(
            self, planes=None, grid_shape=self.shape
        )

    # ------------------------------------------------------------------

    def _apply_planes(self, u: jax.Array) -> jax.Array:
        r = self.radius
        up = jnp.pad(u, [(r, r)] * u.ndim)
        out = None
        for k, off in enumerate(self.offsets):
            term = self.planes[k] * _shifted(up, off, u.shape, r)
            out = term if out is None else out + term
        return out

    def _apply_const(self, u: jax.Array) -> jax.Array:
        interior = box_interior_mask(u.shape, self.logical_m)
        ut = jnp.where(interior, u, jnp.zeros_like(u))
        r = self.radius
        up = jnp.pad(ut, [(r, r)] * u.ndim)
        zero = (0,) * self.ndim
        out = None
        for k, off in enumerate(self.offsets):
            w = self.const_weights[k]
            if w == 0.0:
                continue
            term = w * (ut if off == zero else _shifted(up, off, u.shape, r))
            out = term if out is None else out + term
        if out is None:
            out = jnp.zeros_like(u)
        if self.boundary_mode == "identity":
            return jnp.where(interior, out, u)
        return jnp.where(interior, out, jnp.zeros_like(u))

    def _apply_class_tables(self, u: jax.Array) -> jax.Array:
        """Matvec with per-boundary-class coefficients: the plane value at
        node p is class_tables[k][class(p)] where class(p) packs, per axis,
        {low edge, interior, high edge}.  Zero extra memory: classes come
        from iota, tables are O(3^d) scalars."""
        lm = self.logical_m
        shape = u.shape
        cls = None
        inbox = None
        for axis in range(u.ndim):
            i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
            c = jnp.where(i == 0, 0, jnp.where(i == lm - 1, 2, 1))
            cls = c if cls is None else cls * 3 + c
            ib = i <= lm - 1
            inbox = ib if inbox is None else inbox & ib
        r = self.radius
        up = jnp.pad(u, [(r, r)] * u.ndim)
        out = None
        for k, off in enumerate(self.offsets):
            w = self.class_tables[k].reshape(-1)[cls]
            term = w * _shifted(up, off, shape, r)
            out = term if out is None else out + term
        return jnp.where(inbox, out, jnp.zeros_like(u))

    def _apply_parity(self, u: jax.Array) -> jax.Array:
        """Matvec via the 4^d parity/boundary tables (plane-free const
        P2).  identity mode: reads are interior-masked (the eliminated
        operator's zeroed bc columns) and bc/padding rows pass u through
        (unit diagonal).  raw mode: reads keep bc values, rows outside
        the logical box are zeroed."""
        shape = u.shape
        lm = self.logical_m
        interior = box_interior_mask(shape, lm)
        if self.boundary_mode == "identity":
            src = jnp.where(interior, u, jnp.zeros_like(u))
        else:
            inbox = None
            for axis in range(u.ndim):
                i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
                ib = i <= lm - 1
                inbox = ib if inbox is None else inbox & ib
            src = jnp.where(inbox, u, jnp.zeros_like(u))
        cls = self._parity_class(shape)
        r = self.radius
        up = jnp.pad(src, [(r, r)] * u.ndim)
        out = None
        for k, off in enumerate(self.offsets):
            w = self.parity_tables[k][cls]
            term = w * _shifted(up, off, shape, r)
            out = term if out is None else out + term
        if self.boundary_mode == "identity":
            return jnp.where(interior, out, u)
        return jnp.where(inbox, out, jnp.zeros_like(u))

    def apply(self, u: jax.Array) -> jax.Array:
        """Matvec.  Planes path: K fused shifted multiply-adds.  Const
        path: weights are immediates and masks come from iota — one HBM
        pass over u."""
        if self.parity_tables is not None:
            return self._apply_parity(u)
        if self.class_tables is not None:
            return self._apply_class_tables(u)
        if self.is_const:
            return self._apply_const(u)
        return self._apply_planes(u)

    def __call__(self, u: jax.Array) -> jax.Array:
        return self.apply(u)

    def astype(self, dtype) -> "StencilOperator":
        return dataclasses.replace(
            self,
            planes=None if self.planes is None else self.planes.astype(dtype),
            parity_tables=(None if self.parity_tables is None
                           else self.parity_tables.astype(dtype)),
        )

    @staticmethod
    def from_numpy(
        offsets,
        planes: np.ndarray,
        dtype=jnp.float32,
        const_weights: Optional[Tuple[float, ...]] = None,
        logical_m: Optional[int] = None,
        boundary_mode: str = "identity",
    ) -> "StencilOperator":
        return StencilOperator(
            planes=jnp.asarray(planes, dtype=dtype),
            offsets=tuple(map(tuple, offsets)),
            const_weights=const_weights,
            logical_m=logical_m,
            boundary_mode=boundary_mode,
        )


def detect_const_stencil(
    offsets,
    planes: np.ndarray,
    interior: np.ndarray,
    boundary_mode: str = "identity",
    rtol: float = 0.0,
) -> Optional[Tuple[float, ...]]:
    """Setup-time check (numpy): does this operator match the structure the
    const fast path reproduces —

        row p interior:  A[p, p+off] = w_off * [p+off interior]
        row p boundary:  identity ('identity' mode) or all-zero ('zero')

    i.e. constant interior weights with symmetric column elimination?  If
    so, return the static per-offset weights."""
    ndim = interior.ndim
    zero = (0,) * ndim
    shape = interior.shape
    if not interior.any():
        return None
    weights = []
    rmax = max(max(abs(c) for c in off) for off in offsets)
    ipad = np.pad(interior, rmax, constant_values=False)
    for k, off in enumerate(offsets):
        # interior mask of the neighbor p+off (out-of-range -> False)
        sl = tuple(slice(rmax + o, rmax + o + s) for o, s in zip(off, shape))
        nbr_int = ipad[sl]
        sample = interior & nbr_int
        if sample.any():
            w = float(planes[k][sample].flat[0])
        else:
            w = 0.0
        expect = np.where(interior, w * nbr_int, 0.0)
        if boundary_mode == "identity" and off == zero:
            expect = np.where(interior, expect, 1.0)
        if not np.allclose(planes[k], expect, rtol=rtol, atol=1e-14):
            return None
        weights.append(w)
    return tuple(weights)


def _class_quad_chunked(op: StencilOperator, u: jax.Array, v: jax.Array,
                        chunk: int = 8) -> jax.Array:
    """u^T A v for a class-tables operator, accumulated over z-slab chunks
    so no full-grid temporary is ever materialized.

    Motivation: XLA assigns the fused full-grid matvec of the plain path a
    full-size HLO temp at EVERY residual-norm call site of the jitted
    solve program — at 768^3 that was seven simultaneous 2 GB buffers
    (14 GB of HLO temps), the difference between the tolerance solve
    fitting a 16 GB chip and not.  Chunking bounds the temporaries to
    (chunk + 2r) slabs.  Only used above a size gate: the chunked sum
    reassociates f32 additions, and the parity-pinned small configs must
    keep the exact original summation order."""
    Mz, My, Mx = v.shape
    r = op.radius
    lm = op.logical_m
    W = chunk + 2 * r
    if Mz % chunk:
        raise ValueError(
            f"chunked quadratic form needs Mz % chunk == 0, got {Mz} % "
            f"{chunk} (the quadratic_form gate enforces this)")
    nch = Mz // chunk

    yx_shape = (chunk, My, Mx)
    y = jax.lax.broadcasted_iota(jnp.int32, yx_shape, 1)
    x = jax.lax.broadcasted_iota(jnp.int32, yx_shape, 2)
    cy = jnp.where(y == 0, 0, jnp.where(y == lm - 1, 2, 1))
    cx = jnp.where(x == 0, 0, jnp.where(x == lm - 1, 2, 1))
    zi = jax.lax.broadcasted_iota(jnp.int32, yx_shape, 0)
    inbox_yx = (y <= lm - 1) & (x <= lm - 1)
    tables = op.class_tables

    def body(i, acc):
        z0 = i * chunk
        lo = jnp.clip(z0 - r, 0, Mz - W)
        off = z0 - lo
        blk = jax.lax.dynamic_slice_in_dim(v, lo, W, axis=0)
        blkp = jnp.pad(blk, ((r, r), (r, r), (r, r)))
        ublk = jax.lax.dynamic_slice_in_dim(u, z0, chunk, axis=0)
        zg = z0 + zi
        cz = jnp.where(zg == 0, 0, jnp.where(zg == lm - 1, 2, 1))
        cls = (cz * 3 + cy) * 3 + cx
        inbox = jnp.logical_and(inbox_yx, zg <= lm - 1)
        out = None
        for k, (dz, dy, dx) in enumerate(op.offsets):
            nbr = jax.lax.dynamic_slice(
                blkp, (off + dz + r, r + dy, r + dx), yx_shape)
            term = tables[k].reshape(-1)[cls] * nbr
            out = term if out is None else out + term
        out = jnp.where(inbox, out, jnp.zeros_like(out))
        return acc + jnp.sum(ublk * out)

    return jax.lax.fori_loop(0, nch, body, jnp.zeros((), v.dtype))


def quadratic_form(op: StencilOperator, u: jax.Array, v: jax.Array) -> jax.Array:
    """u^T A v as an on-device reduction (used for mass-weighted norms —
    the replacement for the reference's dolfinx assemble_scalar round trip,
    multigrid.py:203-218)."""
    if (
        op.class_tables is not None
        and v.ndim == 3
        and v.size > (1 << 28)           # ~268M padded points (> 512^3):
                                         # exactly the grids whose solve
                                         # program otherwise blows HBM
        and v.shape[0] % 8 == 0
        and v.shape[0] >= 8 + 2 * op.radius
    ):
        return _class_quad_chunked(op, u, v)
    return jnp.sum(u * op.apply(v))


def mass_norm(M: StencilOperator, r: jax.Array) -> jax.Array:
    """FEM L2 norm sqrt(r^T M r) — semantics of reference res_calculator
    (multigrid.py:203-208)."""
    q = quadratic_form(M, r, r)
    return jnp.sqrt(jnp.maximum(q, 0.0))

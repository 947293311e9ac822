"""Small host-side helpers.

``inclusive_segments`` re-creates the semantics of the reference's
``InclusiveBoxedBy`` iterator (``/root/reference/src/utils.rs:1-76``): it
cuts a token sequence into sub-sequences whose first and last elements both
satisfy the predicate, consuming the sequence left to right.  Tokens before
the first boundary are dropped, and a trailing run that contains fewer than
two boundaries is dropped (the caller retains the corresponding audio and
re-transcribes it with more context).
"""

from __future__ import annotations

from typing import Callable, Iterator, List, Sequence, TypeVar

T = TypeVar("T")


def params_platform(params) -> str:
    """Platform a computation over ``params`` will actually run on.

    Returns the device platform of the first committed ``jax.Array`` leaf
    (e.g. ``"tpu"``, ``"cpu"``), falling back to the process default
    backend for host-side (numpy) pytrees.  TPU-only kernel gates must use
    this rather than ``jax.default_backend()``: in a mixed-backend process
    (a TPU-initialized session tracing a CPU-mesh program, as the
    multi-chip dryrun does) the global default names the wrong platform
    and a Pallas call would be lowered for a backend that cannot run it.
    """
    import jax

    for leaf in jax.tree_util.tree_leaves(params):
        devices = getattr(leaf, "devices", None)
        if callable(devices):
            try:
                return next(iter(devices())).platform
            except Exception:
                continue
    return jax.default_backend()


def params_device_count(params) -> int:
    """Number of distinct devices the params span (1 for unsharded).

    Used by the kernel×mesh guard (``DecodeEngine.__init__``): the Pallas
    kernel impls are validated single-device only, so an engine whose
    params are laid out over a >1-device ``jax.sharding.Mesh`` must fall
    back to the XLA twins rather than trace a Pallas call under GSPMD
    partitioning.

    Takes the MAXIMUM over all leaves, not the first one that answers:
    with heterogeneous placement (a small unsharded leaf committed to one
    device while the large weights span the mesh) the first leaf could
    report 1 and silently bypass the guard (ADVICE r4).
    """
    import jax

    n = 1
    for leaf in jax.tree_util.tree_leaves(params):
        devices = getattr(leaf, "devices", None)
        if callable(devices):
            try:
                n = max(n, len(devices()))
            except Exception:
                continue
    return n


def params_replicated_on_mesh(params, mesh) -> bool:
    """True when every array leaf is fully replicated over exactly the
    mesh's devices.

    The dp-mesh kernel carry (``DecodeEngine(mesh=...)``) runs the
    single-device Pallas kernels per shard via ``jax.shard_map`` — valid
    only when each device holds the FULL weights (pure data parallelism).
    Any tp-sharded leaf, or params living on different devices than the
    mesh, disqualifies the carry and the engine keeps the XLA-twin
    fallback.
    """
    import jax

    mesh_devs = set(np_devices(mesh))
    saw_array = False
    for leaf in jax.tree_util.tree_leaves(params):
        sharding = getattr(leaf, "sharding", None)
        devices = getattr(leaf, "devices", None)
        if sharding is None or not callable(devices):
            continue
        saw_array = True
        try:
            if set(devices()) != mesh_devs:
                return False
            if not sharding.is_fully_replicated:
                return False
        except Exception:
            return False
    return saw_array


def np_devices(mesh):
    return list(mesh.devices.flat)


def inclusive_segments(
    seq: Sequence[T], pred: Callable[[T], bool]
) -> Iterator[Sequence[T]]:
    """Yield sub-slices of ``seq`` bounded inclusively by ``pred`` matches.

    Consecutive segments do not share boundary elements: for boundaries
    b0, b1, b2 the segments are ``[b0..b1]`` and then ``[b2..b3]`` (the
    search restarts *after* each segment's closing boundary).
    """
    i = 0
    n = len(seq)
    while i < n:
        # Find the opening boundary.
        start = None
        for j in range(i, n):
            if pred(seq[j]):
                start = j
                break
        if start is None:
            return
        # Find the closing boundary strictly after the opening one.
        end = None
        for j in range(start + 1, n):
            if pred(seq[j]):
                end = j
                break
        if end is None:
            return
        yield seq[start : end + 1]
        i = end + 1


def segments_list(seq: Sequence[T], pred: Callable[[T], bool]) -> List[Sequence[T]]:
    return list(inclusive_segments(seq, pred))

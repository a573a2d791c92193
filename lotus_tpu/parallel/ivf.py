"""Sharded IVF-Flat: inverted lists distributed across chips, probed
locally, merged over ICI.

BASELINE.md config 5: corpus scales with pod HBM.  Lists are assigned to
devices in contiguous, row-balanced ranges; centroids are replicated.  A
query's top-nprobe lists are computed everywhere (replicated coarse
ranking); each device probes only the lists it owns (non-owned probes are
masked), producing k local candidates per query; candidates ride the ICI as
(k x n_dev) tuples via all_gather and every device computes the identical
final merge.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lotus_tpu.ops.common import MASK_SCORE, NO_HIT, as_distance, dedup_topk, round_up
from lotus_tpu.ops.flat import flat_search
from lotus_tpu.parallel.mesh import SHARD_AXIS


def plan_ivf_shards(state: dict[str, Any], n_shards: int) -> tuple[dict[str, Any], list[dict[str, np.ndarray]]]:
    """Host-side shard plan: contiguous list ranges with balanced row counts.

    Returns ``(plan_meta, shards)``: per shard a dict of equal-shape arrays
    (``vecs``, ``row_ids``, ``list_start``, ``owned``, optionally ``scales``
    / ``norms``) padded to a common ``max_rows`` — the format both the
    in-memory mesh placement (``shard_ivf_state``) and the per-host shard
    persistence (``save_ivf_shards`` / ``load_sharded_ivf_state``) consume.
    """
    starts = np.asarray(state["ivf_list_start"])
    sizes = np.asarray(state["ivf_list_size"])
    vectors = np.asarray(state["ivf_vectors"])
    row_ids = np.asarray(state["ivf_row_ids"])
    scales = np.asarray(state["ivf_row_scales"]) if "ivf_row_scales" in state else None
    norms = np.asarray(state["ivf_norms_sq"]) if "ivf_norms_sq" in state else None
    nlist = len(sizes)

    # Contiguous list ranges with balanced row counts.
    total = int(sizes.sum())
    target = total / n_shards
    bounds = [0]
    acc = 0
    for li in range(nlist):
        acc += int(sizes[li])
        if acc >= target * len(bounds) and len(bounds) < n_shards:
            bounds.append(li + 1)
    while len(bounds) < n_shards + 1:
        bounds.append(nlist)
    bounds[-1] = nlist

    per_dev = []
    max_rows = 0
    window = int(state["meta"]["probe_window"])
    for d in range(n_shards):
        lo, hi = bounds[d], bounds[d + 1]
        if hi > lo:
            row_lo = int(starts[lo])
            row_hi = int(starts[hi - 1] + sizes[hi - 1])
        else:
            row_lo = row_hi = 0
        local_start = np.full(nlist, 0, np.int32)
        owned = np.zeros(nlist, bool)
        if hi > lo:
            local_start[lo:hi] = starts[lo:hi] - row_lo
            owned[lo:hi] = True
        per_dev.append((row_lo, row_hi, local_start, owned))
        max_rows = max(max_rows, row_hi - row_lo)

    # Window overshoot room; block-aligned builds keep every shard's row
    # count a BL multiple so the Pallas grouped probe can run per shard.
    align = max(8, int(state["meta"].get("block_align", 0)) or 8)
    max_rows = round_up(max_rows + window, align)

    # Each storage row's list id (for shard-local residual reconstruction
    # during exact rescoring): derived once from the global CSR layout.
    from lotus_tpu.ops.ivf import centroid_of_position

    pos_list_global = np.asarray(centroid_of_position(starts, vectors.shape[0]))

    shards: list[dict[str, np.ndarray]] = []
    for row_lo, row_hi, local_start, owned in per_dev:
        m = row_hi - row_lo
        vecs = np.zeros((max_rows, vectors.shape[1]), vectors.dtype)
        vecs[:m] = vectors[row_lo:row_hi]
        ids = np.full(max_rows, NO_HIT, np.int32)
        ids[:m] = row_ids[row_lo:row_hi]
        row_list = np.zeros(max_rows, np.int32)
        row_list[:m] = pos_list_global[row_lo:row_hi]
        shard: dict[str, np.ndarray] = {
            "vecs": vecs,
            "row_ids": ids,
            "list_start": local_start,
            "owned": owned,
            "row_list": row_list,
        }
        if scales is not None:
            sc = np.zeros(max_rows, np.float32)
            sc[:m] = scales[row_lo:row_hi]
            shard["scales"] = sc
        if norms is not None:
            nm = np.zeros(max_rows, np.float32)
            nm[:m] = norms[row_lo:row_hi]
            shard["norms"] = nm
        shards.append(shard)
    plan_meta = {"n_shards": n_shards, "max_rows": int(max_rows), "bounds": [int(b) for b in bounds]}
    return plan_meta, shards


def _place_shards(
    shards: list[dict[str, np.ndarray]],
    mesh: Mesh,
    axis_name: str,
    meta: dict[str, Any],
    centroids: Any,
    list_size: Any,
) -> dict[str, Any]:
    """Stack per-shard arrays and place them leading-axis-sharded.

    Multi-process runs hand each process only its local shards (in mesh
    order) via ``jax.make_array_from_process_local_data``; single-process
    runs stack everything and ``device_put``.
    """
    names = list(shards[0].keys())
    placed: dict[str, Any] = {}
    multiproc = jax.process_count() > 1
    for name in names:
        stacked = np.stack([s[name] for s in shards])
        spec = P(axis_name, *([None] * (stacked.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if multiproc:
            placed[name] = jax.make_array_from_process_local_data(sharding, stacked)
        else:
            placed[name] = jax.device_put(jnp.asarray(stacked), sharding)
    out = {
        "meta": meta,
        "centroids": centroids,  # replicated
        "vecs": placed["vecs"],
        "row_ids": placed["row_ids"],
        "list_start": placed["list_start"],
        "owned": placed["owned"],
        "list_size": list_size,  # replicated
        "mesh": mesh,
        "axis_name": axis_name,
    }
    for extra in ("scales", "norms", "row_list"):
        if extra in placed:
            out[extra] = placed[extra]
    return out


def _local_shard_ids(mesh: Mesh, axis_name: str) -> list[int]:
    """Mesh slots owned by this process, in mesh order (all, single-process)."""
    devices = mesh.devices.reshape(-1)
    if jax.process_count() > 1:
        return [i for i, d in enumerate(devices) if d.process_index == jax.process_index()]
    return list(range(len(devices)))


def shard_ivf_state(state: dict[str, Any], mesh: Mesh, axis_name: str = SHARD_AXIS) -> dict[str, Any]:
    """Split a loaded IVF state (ops/ivf.load_ivf_state) across the mesh.

    Host-side: assign contiguous list ranges to devices balancing total
    rows, rebuild per-device storage with *local* offsets, pad to a common
    shape, and place the stacked arrays with the leading axis sharded.
    """
    n_dev = mesh.shape[axis_name]
    _, shards = plan_ivf_shards(state, n_dev)
    shards = [shards[i] for i in _local_shard_ids(mesh, axis_name)]
    return _place_shards(
        shards, mesh, axis_name, state["meta"], state["centroids"], state["ivf_list_size"]
    )


def save_ivf_shards(index_dir: str, state: dict[str, Any], num_shards: int) -> None:
    """Persist a loaded (possibly quantized) IVF state as per-host shards.

    The config-5 lifecycle (BASELINE.md): one process builds and writes
    ``shard_<i>/`` slices + the JSON manifest; at serve time every host
    reads only its own slice(s) (``load_sharded_ivf_state``).  Quantized
    states persist their int8 vectors + scales, so reload skips the
    (expensive) quantization pass entirely.
    """
    from lotus_tpu.parallel.distributed import save_index_shards

    plan_meta, shards = plan_ivf_shards(state, num_shards)
    shard_meta = {
        **plan_meta,
        "vec_dtype": str(np.asarray(shards[0]["vecs"]).dtype),
        "encoding": state["meta"].get("encoding", ""),
    }
    for sid, arrays in enumerate(shards):
        save_index_shards(
            index_dir, arrays, shard_id=sid, num_shards=num_shards, meta=shard_meta
        )


def load_sharded_ivf_state(
    index_dir: str,
    meta: dict[str, Any],
    mesh: Mesh,
    axis_name: str = SHARD_AXIS,
) -> dict[str, Any]:
    """Load per-host index shards and place them across the mesh.

    Each process reads only the shard files of its local mesh slots — the
    DCN-scale reload path for BASELINE config 5 (a 100M-row store never
    funnels through one host).  Requires a manifest written by
    ``save_ivf_shards`` with one shard per mesh device.
    """
    from lotus_tpu.ops import io as index_io
    from lotus_tpu.parallel.distributed import load_index_shard, shard_manifest

    manifest = shard_manifest(index_dir)
    n_dev = mesh.shape[axis_name]
    if int(manifest["num_shards"]) != n_dev:
        raise ValueError(
            f"index has {manifest['num_shards']} shards but the mesh has {n_dev} "
            f"devices along {axis_name!r}; rebuild or resize the mesh"
        )
    local_ids = _local_shard_ids(mesh, axis_name)
    shards = [
        {k: np.asarray(v) for k, v in load_index_shard(index_dir, sid).items()} for sid in local_ids
    ]
    # The quantization pass may have downgraded residual -> plain int8 when
    # residuals were no smaller (load_ivf_state's sample check); the shard
    # manifest records the encoding the persisted vectors actually use.
    mmeta = manifest.get("meta", {})
    if mmeta.get("encoding"):
        meta = {**meta, "encoding": mmeta["encoding"]}
    centroids = jnp.asarray(index_io.read_array(index_dir, "ivf_centroids", mmap=False))
    list_size = jnp.asarray(index_io.read_array(index_dir, "ivf_list_size", mmap=False))
    return _place_shards(shards, mesh, axis_name, meta, centroids, list_size)


def sharded_ivf_search_pallas(
    sharded: dict[str, Any],
    xq: jnp.ndarray,
    k: int,
    *,
    nprobe: int,
    metric: str,
    interpret: bool = False,
    int8_queries: bool = False,
    query_chunk: int | None = None,
    rescore: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Large-batch sharded IVF search: the Pallas grouped probe per shard.

    Each device runs the scalar-prefetched block-DMA probe over the lists it
    owns (non-owned probes contribute no work units), then the per-shard
    top-k candidates ride the ICI as one all_gather and every device merges
    identically.  This is the single-chip winner (docs/benchmarks.md) made
    multi-chip: throughput scales with devices because each shard streams
    only its own probed blocks.

    ``rescore`` (ip/cosine) widens each shard's probe and exactly re-ranks
    its own top-``rescore`` candidates BEFORE the all_gather — rows are
    local to their shard, so the rescore gathers vectors directly via the
    probe's storage positions and the merged result is exact over the pool.
    (Per-shard int4 refinement is not sharded; rescore reconstructs from
    the primary storage.)  ``int8_queries`` / ``query_chunk`` mirror the
    single-device knobs.
    """
    from lotus_tpu.ops.pallas_ivf import BUCKET, _grouped_probe_pallas

    mesh: Mesh = sharded["mesh"]
    axis_name: str = sharded["axis_name"]
    meta = sharded["meta"]
    bl = int(meta.get("block_align", 0))
    if bl < 512 or bl % (512 // BUCKET) != 0:
        raise ValueError(
            f"sharded Pallas probe requires a block_align >= 512 build; got {bl}"
        )
    nlist = int(meta["nlist"])
    window = int(meta["probe_window"])
    nprobe = max(1, min(nprobe, nlist))
    max_blocks = max(1, window // bl)

    squeeze = xq.ndim == 1
    if squeeze:
        xq = xq[None, :]
    xq = xq.astype(jnp.float32)

    if query_chunk is not None and xq.shape[0] > query_chunk:
        parts = [
            sharded_ivf_search_pallas(
                sharded, xq[lo : lo + query_chunk], k, nprobe=nprobe, metric=metric,
                interpret=interpret, int8_queries=int8_queries, rescore=rescore,
            )
            for lo in range(0, xq.shape[0], query_chunk)
        ]
        return jnp.concatenate([p[0] for p in parts]), jnp.concatenate([p[1] for p in parts])

    b = xq.shape[0]
    n_dev = mesh.shape[axis_name]
    centroids = sharded["centroids"]
    list_size = sharded["list_size"]
    has_scales = "scales" in sharded
    has_norms = "norms" in sharded

    residual = meta.get("encoding") == "residual_int8" and sharded["vecs"].dtype == jnp.int8
    do_rescore = rescore is not None and metric != "l2" and "row_list" in sharded
    k_probe = max(k, rescore) if do_rescore else k
    # Unspilled stores hold each row in exactly one list (hence one shard):
    # both the shard-local pool and the cross-shard merge are duplicate-free
    # by construction, so the dedup passes are skipped (same fast path as
    # the single-device probe).
    spilled = float(meta.get("spill_frac", 0.0) or 0.0) > 0.0

    def local_probe(vecs, row_ids, list_start, owned, xq_rep, *extra):
        vecs, row_ids, list_start, owned = vecs[0], row_ids[0], list_start[0], owned[0]
        pos = 0
        scales = row_list = shard_norms = None
        if has_scales:
            scales = extra[pos][0]
            pos += 1
        if has_norms:
            shard_norms = extra[pos][0]
            pos += 1
        if do_rescore:
            row_list = extra[pos][0]

        coarse_s, probe_lists = flat_search(centroids, xq_rep, nprobe, metric=metric)
        probed = _grouped_probe_pallas(
            centroids, vecs, row_ids, list_start, list_size,
            xq_rep, scales, shard_norms if metric == "l2" else None,
            k_probe, nprobe, max_blocks, metric, interpret, int8_queries,
            owned=owned, probe_lists=probe_lists,
            probe_bias=coarse_s if residual else None,
            return_rows=do_rescore,
            packed_ok=do_rescore,
            bl=bl,
            spilled=spilled,
        )
        if do_rescore:
            probe_s, probe_ids, rows = probed
            # Shard-local exact re-rank: reconstruct this shard's candidate
            # rows in f32 and score with the float queries.
            sub = jnp.take(vecs, rows, axis=0).astype(jnp.float32)
            if scales is not None:
                sub = sub * jnp.take(scales, rows, axis=0)[..., None]
            if residual:
                sub = sub + jnp.take(centroids, jnp.take(row_list, rows, axis=0), axis=0)
            exact = jnp.einsum("bd,bkd->bk", xq_rep, sub)
            exact = jnp.where(probe_ids == NO_HIT, MASK_SCORE, exact)
            top_s, sel = jax.lax.top_k(exact, k)
            top_ids = jnp.take_along_axis(probe_ids, sel, axis=1)
        else:
            top_s, top_ids = probed

        all_s = jax.lax.all_gather(top_s, axis_name, axis=0)  # (n_dev, B, k)
        all_i = jax.lax.all_gather(top_ids, axis_name, axis=0)
        cand_s = jnp.moveaxis(all_s, 0, 1).reshape(b, n_dev * k)
        cand_i = jnp.moveaxis(all_i, 0, 1).reshape(b, n_dev * k)
        if not spilled:  # duplicate-free across shards: plain k-way merge
            merged_s, pos2 = jax.lax.top_k(cand_s, k)
            return merged_s, jnp.take_along_axis(cand_i, pos2, axis=1)
        # The merge is score-sorted first so dedup keeps each id's best copy
        # (spilled rows can surface from two shards).
        merged_s, pos2 = jax.lax.top_k(cand_s, min(2 * k, n_dev * k))
        merged_i = jnp.take_along_axis(cand_i, pos2, axis=1)
        return dedup_topk(merged_s, merged_i, k)

    in_specs = [
        P(axis_name, None, None), P(axis_name, None),
        P(axis_name, None), P(axis_name, None), P(),
    ]
    operands = [sharded["vecs"], sharded["row_ids"], sharded["list_start"], sharded["owned"], xq]
    if has_scales:
        in_specs.append(P(axis_name, None))
        operands.append(sharded["scales"])
    if has_norms:
        in_specs.append(P(axis_name, None))
        operands.append(sharded["norms"])
    if do_rescore:
        in_specs.append(P(axis_name, None))
        operands.append(sharded["row_list"])
    fn = jax.shard_map(
        local_probe, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P()), check_vma=False,
    )
    top_s, top_i = fn(*operands)

    dists = as_distance(top_s, metric)
    if metric == "l2":
        q_norms = jnp.sum(jnp.square(xq), axis=-1, keepdims=True)
        dists = jnp.where(top_i == NO_HIT, jnp.finfo(jnp.float32).max, dists + q_norms)
    if squeeze:
        return dists[0], top_i[0]
    return dists, top_i


def sharded_ivf_search(
    sharded: dict[str, Any],
    xq: jnp.ndarray,
    k: int,
    *,
    nprobe: int,
    metric: str,
    rescore: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Search the list-sharded IVF index; returns replicated (dists, ids).

    ``rescore`` (ip/cosine) exactly re-ranks each shard's top-``rescore``
    window candidates in f32 before the all_gather — same shard-local
    semantics as the Pallas variant.
    """
    mesh: Mesh = sharded["mesh"]
    axis_name: str = sharded["axis_name"]
    meta = sharded["meta"]
    nlist = int(meta["nlist"])
    window = int(meta["probe_window"])
    nprobe = max(1, min(nprobe, nlist))

    squeeze = xq.ndim == 1
    if squeeze:
        xq = xq[None, :]
    xq = xq.astype(jnp.float32)
    b = xq.shape[0]
    n_dev = mesh.shape[axis_name]

    centroids = sharded["centroids"]
    list_size = sharded["list_size"]
    offsets = jax.lax.broadcasted_iota(jnp.int32, (window, 1), 0).squeeze(-1)

    has_scales = "scales" in sharded
    has_norms = "norms" in sharded

    residual = meta.get("encoding") == "residual_int8" and sharded["vecs"].dtype == jnp.int8
    do_rescore = rescore is not None and metric != "l2" and "row_list" in sharded
    k_probe = max(k, rescore) if do_rescore else k

    def local_probe(vecs, row_ids, list_start, owned, xq_rep, *extra):
        vecs, row_ids, list_start, owned = vecs[0], row_ids[0], list_start[0], owned[0]
        pos_arg = 0
        scales = row_list = shard_norms = None
        if has_scales:
            scales = extra[pos_arg][0]
            pos_arg += 1
        if has_norms:
            shard_norms = extra[pos_arg][0]
            pos_arg += 1
        if do_rescore:
            row_list = extra[pos_arg][0]
        coarse_s, probe_lists = flat_search(centroids, xq_rep, nprobe, metric=metric)

        starts = list_start[probe_lists]  # (B, nprobe) local offsets
        sizes = list_size[probe_lists]
        mine = owned[probe_lists]  # (B, nprobe)
        rows = starts[:, :, None] + offsets[None, None, :]
        in_list = (offsets[None, None, :] < sizes[:, :, None]) & mine[:, :, None]
        rows_flat = rows.reshape(b, nprobe * window)
        gathered = vecs[rows_flat]

        if vecs.dtype == jnp.int8 or xq_rep.dtype == jnp.bfloat16 or vecs.dtype == jnp.bfloat16:
            cd, prec = jnp.bfloat16, None
        else:
            cd, prec = jnp.float32, jax.lax.Precision.HIGHEST
        sims = jnp.einsum(
            "qd,qnd->qn", xq_rep.astype(cd), gathered.astype(cd),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if scales is not None:
            sims = sims * scales[rows_flat]
        if residual:
            # Residual store: add the exact q.c term of each probe slot.
            sims = (sims.reshape(b, nprobe, window) + coarse_s[:, :, None]).reshape(b, -1)
        if metric == "l2":
            norms = shard_norms if shard_norms is not None else jnp.sum(
                jnp.square(vecs.astype(jnp.float32)), axis=-1
            )
            sims = 2.0 * sims - norms[rows_flat]
        scores = jnp.where(in_list.reshape(b, nprobe * window), sims, MASK_SCORE)
        kc = min(2 * k_probe, nprobe * window)
        top_s, pos = jax.lax.top_k(scores, kc)
        cand_rows = jnp.take_along_axis(rows_flat, pos, axis=1)
        top_ids = row_ids[cand_rows]
        top_ids = jnp.where(top_s <= MASK_SCORE / 2, NO_HIT, top_ids)
        if do_rescore:
            top_s, top_ids, cand_rows = dedup_topk(top_s, top_ids, k_probe, aux=cand_rows)
            # Shard-local exact re-rank over reconstructed f32 rows.
            sub = jnp.take(vecs, cand_rows, axis=0).astype(jnp.float32)
            if scales is not None:
                sub = sub * jnp.take(scales, cand_rows, axis=0)[..., None]
            if residual:
                sub = sub + jnp.take(centroids, jnp.take(row_list, cand_rows, axis=0), axis=0)
            exact = jnp.einsum("qd,qkd->qk", xq_rep, sub)
            exact = jnp.where(top_ids == NO_HIT, MASK_SCORE, exact)
            top_s, sel = jax.lax.top_k(exact, k)
            top_ids = jnp.take_along_axis(top_ids, sel, axis=1)
        else:
            top_s, top_ids = dedup_topk(top_s, top_ids, k)

        all_s = jax.lax.all_gather(top_s, axis_name, axis=0)  # (n_dev, B, k)
        all_i = jax.lax.all_gather(top_ids, axis_name, axis=0)
        cand_s = jnp.moveaxis(all_s, 0, 1).reshape(b, n_dev * k)
        cand_i = jnp.moveaxis(all_i, 0, 1).reshape(b, n_dev * k)
        fs, pos2 = jax.lax.top_k(cand_s, min(2 * k, n_dev * k))
        fi = jnp.take_along_axis(cand_i, pos2, axis=1)
        return dedup_topk(fs, fi, k)

    in_specs = [
        P(axis_name, None, None), P(axis_name, None),
        P(axis_name, None), P(axis_name, None), P(),
    ]
    operands = [sharded["vecs"], sharded["row_ids"], sharded["list_start"], sharded["owned"], xq]
    if has_scales:
        in_specs.append(P(axis_name, None))
        operands.append(sharded["scales"])
    if has_norms:
        in_specs.append(P(axis_name, None))
        operands.append(sharded["norms"])
    if do_rescore:
        in_specs.append(P(axis_name, None))
        operands.append(sharded["row_list"])
    fn = jax.shard_map(
        local_probe, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P()), check_vma=False,
    )
    top_s, top_i = fn(*operands)

    dists = as_distance(top_s, metric)
    if metric == "l2":
        q_norms = jnp.sum(jnp.square(xq), axis=-1, keepdims=True)
        dists = jnp.where(top_i == NO_HIT, jnp.finfo(jnp.float32).max, dists + q_norms)
    if squeeze:
        return dists[0], top_i[0]
    return dists, top_i

"""TpuVS — the device-resident vector store.

Replaces the reference's faiss-backed default store
(``lotus/vector_store/faiss_vs.py:13-77``).  Vectors live in HBM as a padded
2-D array; queries compile to one blocked matmul + fused top-k program
(``lotus_tpu/ops/flat.py``).  Subset (``ids``) search is a validity mask —
a single masked pass instead of the reference's temporary-index rebuild.
With ``index_type="ivf"`` the store trains a coarse quantizer and probes
inverted lists (``lotus_tpu/ops/ivf.py``).  With a multi-device mesh the
database rows are sharded over ICI and per-shard top-k results are merged
with an all-gather (``lotus_tpu/parallel``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from numpy.typing import NDArray

from lotus_tpu.ops import io as index_io
from lotus_tpu.ops.common import fetch_int32, round_up
from lotus_tpu.ops.flat import DEFAULT_BLOCK_ROWS, flat_search
from lotus_tpu.types import RMOutput
from lotus_tpu.vector_store.vs import VS

_DTYPE_NAMES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
    "int8": jnp.int8,
}


class TpuVS(VS):
    """XLA-native Flat / IVF-Flat vector store.

    Args:
        index_type: "flat" (exact) or "ivf" (IVF-Flat approximate).
        metric: "ip" (default, matching the reference's
            METRIC_INNER_PRODUCT), "cosine", or "l2".
        device_dtype: dtype for the device-resident database ("float32" or
            "bfloat16").  bfloat16 halves HBM and doubles MXU rate; disk
            storage stays float32 for fidelity.
        nlist / nprobe: IVF parameters (ignored for flat).
        mesh: optional jax.sharding.Mesh; when given with >1 device, the
            database rows are sharded and searches merge per-shard top-k
            over ICI.
        approx: use TPU approx_max_k (PartialReduce) inside blocks; bounded
            recall loss, large speedup at big N.
    """

    def __init__(
        self,
        index_type: str = "flat",
        metric: str = "ip",
        device_dtype: str = "float32",
        nlist: Optional[int] = None,
        nprobe: Optional[int] = None,
        mesh: Optional[Any] = None,
        approx: bool = False,
        block_rows: int = DEFAULT_BLOCK_ROWS,
        int8_encoding: str = "residual",
        spill_frac: float = 0.0,
        int8_refine: bool = False,
        rescore: Optional[int] = None,
        scan: str = "auto",
        int8_queries: Optional[bool] = None,
        query_chunk: int = 2048,
        recall_target: Optional[float] = None,
    ) -> None:
        super().__init__()
        if index_type not in ("flat", "ivf"):
            raise ValueError(f"index_type must be 'flat' or 'ivf', got {index_type!r}")
        if int8_encoding not in ("residual", "plain"):
            raise ValueError(f"int8_encoding must be 'residual' or 'plain', got {int8_encoding!r}")
        self.index_type = index_type
        self.metric = metric
        self.device_dtype = device_dtype
        self.nlist = nlist
        # None = "use the default (32) until autotune picks one"; an explicit
        # value is respected — lazy calibration warns before repinning it.
        self._nprobe_user_set = nprobe is not None
        # Serving regimes disabled by calibration (see _adopt_calibration).
        self._regimes_dropped: set[str] = set()
        self.nprobe = 32 if nprobe is None else int(nprobe)
        self.mesh = mesh
        self.approx = approx
        self.block_rows = block_rows
        # int8 IVF stores: quantize (vec - list centroid) residuals and add
        # the exact q.c term back at probe time (~4x smaller int8 step).
        self.int8_encoding = int8_encoding
        # Fraction of rows replicated into their 2nd-nearest list (SOAR-style
        # boundary spill; probes dedup by row id).
        self.spill_frac = spill_frac
        # int8 loads: also build a packed-int4 refinement (0.5 byte/dim) and
        # exactly re-rank the probes' top-``rescore`` candidates with f32
        # queries — removes quantization rank flips at the top-k boundary.
        self.int8_refine = int8_refine
        self.rescore = rescore
        # Flat-scan kernel choice: "auto" picks the streaming Pallas scan for
        # large approximate bf16 batches (equal QPS, ~40% fewer top-k misses
        # than approx_max_k — docs/benchmarks.md) and the XLA scan otherwise;
        # "pallas"/"xla" force one.
        if scan not in ("auto", "xla", "pallas"):
            raise ValueError(f"scan must be 'auto', 'xla' or 'pallas', got {scan!r}")
        self.scan = scan
        # Pallas-probe query quantization: int8 queries run the int8 MXU dot
        # (2x rate); with rescoring active the exact re-rank absorbs the
        # quantization noise, so None (auto) enables it exactly when the
        # store is int8 AND rescoring is on — the bench-measured best point.
        self.int8_queries = int8_queries
        # Probe the batch in slices of this many queries: bounds the
        # candidate-pool memory AND keeps full MXU lane occupancy (2048 is
        # the measured optimum at B=4096/nprobe=256; 4096 fails to compile).
        self.query_chunk = query_chunk
        # IVF recall target: when set, the store calibrates nprobe against
        # a full-probe oracle on first use (or reuses a calibration
        # persisted in meta.json) instead of serving the raw ``nprobe``.
        # See ops/autotune.py and calibrate_nprobe().
        self.recall_target = recall_target
        self.index_dir: str | None = None
        # Device-resident state for the currently loaded index.
        self._state: dict[str, Any] | None = None
        # Run the Pallas probe in interpret mode (CPU testing only).
        self._pallas_interpret = False
        # Observability: cumulative search statistics (stats-dict convention).
        self.stats: dict[str, Any] = {
            "searches": 0,
            "queries": 0,
            "subset_searches": 0,
            # End-to-end wall time per search, device->host transfer included
            # (the result is materialized before the clock stops).
            "total_wall_s": 0.0,
        }

    def _mesh_devices(self) -> int:
        return len(self.mesh.devices.flat) if self.mesh is not None else 1

    @classmethod
    def distributed(cls, **kwargs: Any) -> "TpuVS":
        """A store sharded over every reachable chip (multi-host included).

        Initializes the multi-process runtime when the environment declares
        one (``parallel.distributed.init_runtime``), builds the DCN-aware
        flat serving mesh, and returns a TpuVS over it: index builds persist
        per-host shards, loads read only each host's slice, and searches
        merge per-shard top-k over ICI/DCN (BASELINE.md config 5).
        """
        from lotus_tpu.parallel import init_runtime, serving_mesh

        init_runtime()
        return cls(mesh=serving_mesh(), **kwargs)

    # ------------------------------------------------------------------ build
    def index(
        self,
        docs: list[str],
        embeddings: NDArray[np.float64],
        index_dir: str,
        **kwargs: Any,
    ) -> None:
        emb = np.ascontiguousarray(np.asarray(embeddings, dtype=np.float32))
        if emb.ndim != 2:
            raise ValueError(f"embeddings must be 2-D, got shape {emb.shape}")
        index_io.write_array(index_dir, "vectors", emb)
        meta: dict[str, Any] = {
            "kind": self.index_type,
            "metric": self.metric,
            "n_rows": int(emb.shape[0]),
            "dim": int(emb.shape[1]),
            "device_dtype": self.device_dtype,
        }
        if self.index_type == "ivf":
            from lotus_tpu.ops.ivf import build_ivf
            from lotus_tpu.ops.pallas_ivf import BL as _PALLAS_BL

            nlist = self.nlist or max(1, int(np.sqrt(emb.shape[0])))
            # Block-align lists when they are large enough that the padding
            # is cheap (avg list >= one block): unlocks the Pallas grouped
            # probe, the fastest large-batch path (docs/benchmarks.md).
            # Prefer the full default block (fewer grid steps, measured +7%
            # QPS at 10M); fall back to 512 for mid-size lists.
            if emb.shape[0] >= _PALLAS_BL * nlist:
                block_align = _PALLAS_BL
            elif emb.shape[0] >= 512 * nlist:
                block_align = 512
            else:
                block_align = None
            ivf_meta = build_ivf(
                index_dir, emb, nlist=nlist, metric=self.metric, block_align=block_align,
                spill_frac=self.spill_frac if block_align else 0.0,
            )
            meta.update(ivf_meta)
            if self.device_dtype == "int8" and self.int8_encoding == "residual" and self.metric != "l2":
                meta["encoding"] = "residual_int8"
        index_io.write_meta(index_dir, meta)
        if meta["kind"] == "ivf" and self._mesh_devices() > 1:
            # Config-5 lifecycle: persist one shard per mesh slot so that at
            # serve time each host reads only its own slice (and quantization
            # never re-runs).  parallel/distributed.py holds the shard IO.
            from lotus_tpu.ops.ivf import load_ivf_state
            from lotus_tpu.parallel import save_ivf_shards

            dtype = _DTYPE_NAMES[self.device_dtype]
            full = load_ivf_state(index_dir, meta, dtype, refine_int4=False, device=False)
            full["meta"] = full.get("meta", meta)
            save_ivf_shards(index_dir, full, self._mesh_devices())
        self.index_dir = index_dir
        self._state = None  # lazily materialized on first search

    def load_index(self, index_dir: str) -> None:
        index_io.read_meta(index_dir)  # validate manifest
        self.index_dir = index_dir
        self._state = None

    # ------------------------------------------------------------- device load
    def _materialize(self) -> dict[str, Any]:
        if self._state is not None:
            return self._state
        if self.index_dir is None:
            raise ValueError("Index not loaded")
        meta = index_io.read_meta(self.index_dir)
        dtype = _DTYPE_NAMES[meta.get("device_dtype", self.device_dtype)]
        vecs = index_io.read_array(self.index_dir, "vectors")
        n, d = vecs.shape

        state: dict[str, Any] = {"meta": meta, "n_rows": n, "dim": d, "dtype": dtype}
        if meta["kind"] == "ivf":
            from lotus_tpu.ops.ivf import load_ivf_state

            if self._mesh_devices() > 1 and index_io.has_shard_manifest(self.index_dir):
                # Shard-persisted index: each host loads only its own slices
                # (the config-5 reload path) — the monolithic arrays never
                # materialize, halving HBM vs the round-2 in-memory split.
                from lotus_tpu.parallel import load_sharded_ivf_state

                sharded = load_sharded_ivf_state(self.index_dir, meta, self.mesh)
                state["meta"] = sharded["meta"]
                state["ivf_sharded"] = sharded
            else:
                state.update(
                    load_ivf_state(self.index_dir, meta, dtype, refine_int4=self.int8_refine)
                )
                if self._mesh_devices() > 1:
                    from lotus_tpu.parallel import shard_ivf_state

                    ivf_full = dict(state)
                    # Honor the load's encoding decision (residual coding is
                    # downgraded to plain int8 when residuals are no smaller
                    # than the raw vectors) — clobbering it back would make
                    # sharded probes add a bogus centroid bias.
                    ivf_full["meta"] = state.get("meta") or meta
                    state["ivf_sharded"] = shard_ivf_state(ivf_full, self.mesh)
        else:
            # Flat index: the scan array IS the index; build it eagerly.
            self._ensure_flat_arrays(state)
        self._state = state
        return state

    def _ensure_flat_arrays(self, state: dict[str, Any]) -> None:
        """Materialize the padded scan arrays (flat path).

        For IVF indexes this is deferred until a search actually needs the
        exhaustive path (ids-restricted searches or the large-batch regime)
        — building it eagerly would double HBM use for nothing.
        """
        if "xb" in state:
            return
        meta, dtype = state["meta"], state["dtype"]
        n, d = state["n_rows"], state["dim"]
        vecs = index_io.read_array(self.index_dir, "vectors")
        n_pad = round_up(max(n, 1), self.block_rows) if n > self.block_rows else n
        xb = np.zeros((n_pad, d), dtype=np.float32)
        xb[:n] = vecs
        if dtype == jnp.int8:
            from lotus_tpu.ops.quant import quantize_rows

            q, scales = quantize_rows(jnp.asarray(xb))
            state["xb"] = q
            state["xb_scales"] = scales
            state["xb_norms_sq"] = (
                jnp.sum(jnp.square(jnp.asarray(xb)), axis=-1) if meta["metric"] == "l2" else None
            )
        else:
            state["xb"] = jnp.asarray(xb, dtype=dtype)
            state["xb_scales"] = None
            if meta["metric"] == "l2":
                state["xb_norms_sq"] = jnp.sum(
                    jnp.square(state["xb"].astype(jnp.float32)), axis=-1
                )
            else:
                state["xb_norms_sq"] = None
        if self.mesh is not None and len(self.mesh.devices.flat) > 1:
            from lotus_tpu.parallel import shard_rows

            state["xb_sharded"], _ = shard_rows(state["xb"], self.mesh, block_rows=self.block_rows)
            if state["xb_scales"] is not None:
                state["xb_scales_sharded"], _ = shard_rows(
                    state["xb_scales"][:, None], self.mesh, block_rows=self.block_rows
                )
                state["xb_scales_sharded"] = state["xb_scales_sharded"][:, 0]

    # ------------------------------------------------------- ids-subset (IVF)
    @staticmethod
    def _subset_bucket(m: int, block_rows: int) -> int:
        """Padded subset size: power-of-two buckets bound recompilations."""
        bucket = 1024
        while bucket < m:
            bucket <<= 1
        if bucket > block_rows:
            bucket = round_up(bucket, block_rows)
        return bucket

    def _ivf_subset_search(
        self, state: dict[str, Any], xq: jnp.ndarray, k: int, ids: list[int]
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Exact search restricted to ``ids`` without a second full-size copy.

        The allowed rows are gathered out of the (already device-resident)
        IVF storage via the original-id -> storage-row inverse permutation and
        scanned exactly — at 10M rows int8 this allocates O(|ids| x d), not
        another 8 GB flat array (the round-1 fallback this replaces).
        """
        meta = state["meta"]
        if "ivf_inv_perm" not in state:
            storage_ids = np.asarray(state["ivf_row_ids"])
            inv = np.full(state["n_rows"], 0, np.int32)
            live = storage_ids >= 0
            inv[storage_ids[live]] = np.nonzero(live)[0].astype(np.int32)
            state["ivf_inv_perm"] = jnp.asarray(inv)

        ids_np = np.asarray(ids, dtype=np.int64)
        m = ids_np.shape[0]
        m_pad = self._subset_bucket(m, self.block_rows)
        ids_padded = np.zeros(m_pad, np.int64)
        ids_padded[:m] = ids_np

        storage_rows = jnp.take(state["ivf_inv_perm"], jnp.asarray(ids_padded), axis=0)
        subset = jnp.take(state["ivf_vectors"], storage_rows, axis=0)
        scales = state.get("ivf_row_scales")
        sub_scales = jnp.take(scales, storage_rows, axis=0) if scales is not None else None
        norms = state.get("ivf_norms_sq")
        sub_norms = jnp.take(norms, storage_rows, axis=0) if norms is not None else None
        if meta.get("encoding") == "residual_int8" and subset.dtype == jnp.int8:
            # Residual store: reconstruct f32 rows (residual * scale + list
            # centroid) for the exact subset scan — O(|ids| x d) only.
            if "ivf_pos_list" not in state:
                from lotus_tpu.ops.ivf import centroid_of_position

                starts = np.asarray(state["ivf_list_start"])
                state["ivf_pos_list"] = jnp.asarray(
                    centroid_of_position(starts, int(state["ivf_vectors"].shape[0]))
                )
            lists_of_rows = jnp.take(state["ivf_pos_list"], storage_rows, axis=0)
            subset = subset.astype(jnp.float32) * sub_scales[:, None] + jnp.take(
                state["centroids"], lists_of_rows, axis=0
            )
            sub_scales = None

        dists, pos = flat_search(
            subset, xq, min(k, m),
            metric=meta["metric"], n_rows=m, xb_norms_sq=sub_norms,
            block_rows=self.block_rows, xb_scales=sub_scales,
        )
        # Positions in the subset map back to the caller's ids.
        hit_ids = jnp.where(pos >= 0, jnp.take(jnp.asarray(ids_padded), jnp.maximum(pos, 0)), -1)
        return dists, hit_ids

    def _disk_subset_search(
        self, state: dict[str, Any], xq: jnp.ndarray, k: int, ids: list[int]
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Exact subset search sourcing rows from the on-disk f32 vectors.

        Used when the device state is shard-only (config-5 reload): the
        monolithic quantized arrays never materialize, and an ids-restricted
        search only needs O(|ids| x d) — mmap-gathered exactly, at full f32
        fidelity (better than the device store's int8).
        """
        meta = state["meta"]
        vecs = index_io.read_array(self.index_dir, "vectors")
        ids_np = np.asarray(ids, dtype=np.int64)
        m = ids_np.shape[0]
        m_pad = self._subset_bucket(m, self.block_rows)
        sub = np.zeros((m_pad, vecs.shape[1]), np.float32)
        sub[:m] = vecs[ids_np]
        dists, pos = flat_search(
            jnp.asarray(sub), xq, min(k, m), metric=meta["metric"], n_rows=m,
            block_rows=self.block_rows,
        )
        ids_padded = np.zeros(m_pad, np.int64)
        ids_padded[:m] = ids_np
        hit_ids = jnp.where(pos >= 0, jnp.take(jnp.asarray(ids_padded), jnp.maximum(pos, 0)), -1)
        return dists, hit_ids

    # ----------------------------------------------------------------- search
    # ----------------------------------------------------------- IVF probing
    def _probe_ivf(
        self,
        state: dict[str, Any],
        xq: Any,
        k_eff: int,
        nprobe: int,
        *,
        use_pallas: bool,
        rescore: Optional[int],
        int8_queries: Optional[bool],
        query_chunk: Optional[int],
    ) -> tuple[Any, Any]:
        """Run one IVF probe on the serving path (Pallas grouped probe or
        window probe; sharded when the state carries shards)."""
        meta = state["meta"]
        if use_pallas:
            int8_q = int8_queries
            if "ivf_sharded" in state:
                from lotus_tpu.parallel import sharded_ivf_search_pallas

                if int8_q is None:  # auto: int8 shards + rescoring active
                    int8_q = bool(
                        state["ivf_sharded"]["vecs"].dtype == jnp.int8
                        and rescore
                        and not self._pallas_interpret
                    )
                return sharded_ivf_search_pallas(
                    state["ivf_sharded"], jnp.asarray(xq), k_eff, nprobe=nprobe,
                    metric=meta["metric"], interpret=self._pallas_interpret,
                    rescore=rescore, int8_queries=int8_q,
                    query_chunk=query_chunk,
                )
            from lotus_tpu.ops.pallas_ivf import ivf_search_pallas

            if int8_q is None:  # auto: int8 store + rescoring active
                int8_q = bool(
                    state.get("ivf_vectors") is not None
                    and state["ivf_vectors"].dtype == jnp.int8
                    and rescore
                    and not self._pallas_interpret
                )
            return ivf_search_pallas(
                state, jnp.asarray(xq), k_eff, nprobe=nprobe,
                metric=meta["metric"], interpret=self._pallas_interpret,
                rescore=rescore, int8_queries=int8_q,
                query_chunk=query_chunk,
            )
        if "ivf_sharded" in state:
            from lotus_tpu.parallel import sharded_ivf_search

            return sharded_ivf_search(
                state["ivf_sharded"], jnp.asarray(xq), k_eff, nprobe=nprobe,
                metric=meta["metric"], rescore=rescore,
            )
        from lotus_tpu.ops.ivf import ivf_search

        return ivf_search(
            state, jnp.asarray(xq), k_eff, nprobe=nprobe, metric=meta["metric"],
            rescore=rescore,
        )

    def _pallas_eligible(self, meta: dict[str, Any]) -> bool:
        return int(meta.get("block_align", 0)) >= 512 and (
            jax.default_backend() == "tpu" or self._pallas_interpret
        )

    def _exact_topk(self, xq: np.ndarray, k: int, metric: str) -> np.ndarray:
        """Exact float32 top-k over the UNQUANTISED on-disk corpus.

        Streams the mmap'd ``vectors`` array in row chunks and keeps a
        running top-k on host — the ground truth for absolute-recall
        calibration (cheap at calibration's nq<=256)."""
        vecs = index_io.read_array(self.index_dir, "vectors")
        n = vecs.shape[0]
        nq = xq.shape[0]
        k = min(k, n)
        xq_dev = jnp.asarray(xq, dtype=jnp.float32)
        best_s = np.full((nq, 0), 0.0, dtype=np.float32)
        best_i = np.full((nq, 0), -1, dtype=np.int64)
        chunk = 1 << 18
        for start in range(0, n, chunk):
            block = jnp.asarray(np.asarray(vecs[start : start + chunk]), dtype=jnp.float32)
            scores = xq_dev @ block.T
            if metric == "l2":  # argmin ||x-q||^2 == argmax (2 q.x - ||x||^2)
                scores = 2.0 * scores - jnp.sum(jnp.square(block), axis=-1)[None, :]
            scores = np.asarray(scores, dtype=np.float32)
            ids = np.arange(start, start + scores.shape[1], dtype=np.int64)
            cat_s = np.concatenate([best_s, scores], axis=1)
            cat_i = np.concatenate([best_i, np.broadcast_to(ids, (nq, ids.size))], axis=1)
            keep = np.argpartition(-cat_s, min(k, cat_s.shape[1] - 1), axis=1)[:, :k]
            best_s = np.take_along_axis(cat_s, keep, axis=1)
            best_i = np.take_along_axis(cat_i, keep, axis=1)
        order = np.argsort(-best_s, axis=1)
        return np.take_along_axis(best_i, order, axis=1)

    def calibrate_nprobe(
        self,
        recall_target: Optional[float] = None,
        *,
        k: int = 10,
        nq: int = 256,
        seed: int = 0,
        persist: bool = True,
        ladder: Optional[list[int]] = None,
        oracle: str = "full_probe",
    ) -> dict[str, Any]:
        """Calibrate nprobe for a recall@k target and adopt it.

        Samples ``nq`` stored rows as stand-in queries and walks an nprobe
        ladder on EVERY probe path the store serves with — the Pallas
        grouped probe (large batches) and the window probe (small batches)
        when both apply; a ladder point must meet the target on each (see
        ops/autotune.py).  The result is persisted into the index's
        ``meta.json`` (``"calibration"``) so later loads skip the
        measurement, and ``self.nprobe`` is set to the chosen value.

        Args:
            oracle: ``"full_probe"`` (default) measures recall RELATIVE to
                the store's own best probe — quantization loss vs exact
                float32 is NOT priced in.  ``"exact"`` ranks against an
                exact float32 scan of the unquantised corpus, so the target
                is ABSOLUTE recall; when the store's structural ceiling
                (the full probe itself) is below the target, the result is
                flagged ``target_unreachable`` and a warning is logged.

        When one regime's ceiling is below the target but another's is not
        (e.g. the Pallas fold's candidate caps on few-huge-list corpora),
        the failing regime is DROPPED from serving (``regimes_dropped`` in
        the result, persisted with the calibration) and the ladder re-runs
        on the survivors; ``__call__`` routes large batches to the
        exhaustive scan instead of the dropped Pallas path.

        The reference leaves this trade-off entirely to the user (faiss
        ``nprobe`` is a raw knob, ``lotus/vector_store/faiss_vs.py``).
        """
        import lotus_tpu
        from lotus_tpu.ops import autotune

        if oracle not in ("full_probe", "exact"):
            raise ValueError(f"oracle must be 'full_probe' or 'exact', got {oracle!r}")
        state = self._materialize()
        meta = state["meta"]
        if meta["kind"] != "ivf":
            raise ValueError("calibrate_nprobe requires an IVF index")
        target = self.recall_target if recall_target is None else float(recall_target)
        if target is None:
            raise ValueError("pass recall_target= (or construct TpuVS with one)")
        key = f"{target:g}@{int(k)}" + ("" if oracle == "full_probe" else "/exact")
        cal = dict(meta.get("calibration") or {})
        if key in cal:
            self._adopt_calibration(cal[key])
            return cal[key]

        n = state["n_rows"]
        rng = np.random.default_rng(seed)
        sample = np.sort(rng.choice(n, size=min(nq, n), replace=False))
        xq = np.asarray(
            self.get_vectors_from_index(self.index_dir, [int(i) for i in sample]),
            dtype=np.float32,
        )
        use_pallas = self._pallas_eligible(meta)

        def probe_fn(use_pallas_path: bool, q_chunk: int | None):
            def search_fn(q: np.ndarray, kk: int, nprobe: int) -> np.ndarray:
                q = np.asarray(q, np.float32)
                if q_chunk is None or q.shape[0] <= q_chunk:
                    parts = [q]
                else:  # bound the window probe's (b, nprobe, window) gather
                    parts = np.array_split(q, -(-q.shape[0] // q_chunk))
                out = []
                for p in parts:
                    _, idx = self._probe_ivf(
                        state, p, kk, nprobe,
                        use_pallas=use_pallas_path, rescore=self.rescore,
                        int8_queries=self.int8_queries, query_chunk=self.query_chunk,
                    )
                    out.append(np.asarray(idx))
                return np.concatenate(out, axis=0)

            return search_fn

        # Calibrate the path __call__ actually serves: an eligible store
        # serves EVERY batch size through the Pallas grouped probe (round-5
        # planner, docs/benchmarks.md); the window probe serves only
        # non-aligned stores — or an eligible store whose Pallas regime gets
        # dropped below.  Including a never-served regime in the min would
        # inflate nprobe (the paths only guarantee ~0.9 mutual top-k overlap
        # at equal nprobe).
        fns: dict[str, Any] = (
            {"pallas": probe_fn(True, None)} if use_pallas
            else {"window": probe_fn(False, 32)}
        )
        oracle_idx = self._exact_topk(xq, k, meta["metric"]) if oracle == "exact" else None

        result = autotune.calibrate_nprobe(
            fns, xq, nlist=int(meta["nlist"]), recall_target=target,
            k=k, ladder=ladder, oracle_indices=oracle_idx,
            oracle_regime="pallas" if use_pallas else "window",
        )
        if result.get("target_unreachable") and use_pallas:
            # Regime-aware recovery: the Pallas fold's structural ceiling
            # (per-(query,list) candidate caps on degenerate corpora) is
            # below the target while the window probe scans whole lists and
            # has no such cap.  DROP the Pallas regime and recalibrate on
            # the fallback serving paths — __call__ then routes small
            # batches to the window probe and large batches to the
            # exhaustive scan — but only when the fallback actually reaches
            # the target (otherwise keep serving the higher-ceiling path).
            fallback = {"window": probe_fn(False, 32)}
            recal = autotune.calibrate_nprobe(
                fallback, xq, nlist=int(meta["nlist"]), recall_target=target,
                k=k, ladder=ladder, oracle_indices=oracle_idx,
                oracle_regime="window",
            )
            if not recal.get("target_unreachable"):
                lotus_tpu.logger.warning(
                    "calibrate_nprobe: the pallas regime cannot reach "
                    "recall_target=%.4g (ceiling %.4f); dropping it from "
                    "serving and recalibrating on the window probe.",
                    target, result["ceiling"],
                )
                recal["regimes_dropped"] = ["pallas"]
                result = recal
        if result.get("target_unreachable"):
            lotus_tpu.logger.warning(
                "calibrate_nprobe: recall_target=%.4g is UNREACHABLE on this "
                "store — the full probe's recall@%d ceiling on the worst "
                "serving regime (%s oracle) is %.4f (quantization / candidate "
                "caps / cross-regime disagreement). Serving the full probe; "
                "rebuild with higher-fidelity storage (rescore/int8_refine/"
                "float32) to reach the target.",
                target, k, result["oracle"], result["ceiling"],
            )
        cal[key] = result
        meta["calibration"] = cal
        if persist and self.index_dir is not None:
            # Persist onto the on-disk manifest (not the runtime meta, which
            # load_ivf_state may have annotated), so reloads skip the run.
            disk_meta = index_io.read_meta(self.index_dir)
            disk_meta["calibration"] = {**(disk_meta.get("calibration") or {}), key: result}
            index_io.write_meta(self.index_dir, disk_meta)
        self._adopt_calibration(result)
        return result

    def _adopt_calibration(self, result: dict[str, Any]) -> None:
        import lotus_tpu

        # Calibration-driven regime restriction (persisted with the entry,
        # so reloads route the same way without re-measuring).
        self._regimes_dropped = set(result.get("regimes_dropped", []))
        new = int(result["nprobe"])
        if self._nprobe_user_set and new != self.nprobe:
            lotus_tpu.logger.warning(
                "calibrate_nprobe: overriding explicitly constructed "
                "nprobe=%d with calibrated nprobe=%d (recall_target=%g). "
                "Drop the nprobe= argument to silence this.",
                self.nprobe, new, result["recall_target"],
            )
        self.nprobe = new

    def __call__(
        self,
        query_vectors: NDArray[np.float64],
        K: int,
        ids: list[int] | None = None,
        **kwargs: Any,
    ) -> RMOutput:
        import time as _time

        t_start = _time.perf_counter()
        state = self._materialize()
        meta = state["meta"]
        n, d = state["n_rows"], state["dim"]

        xq = np.asarray(query_vectors, dtype=np.float32)
        if xq.ndim == 1:
            xq = xq[None, :]
        if xq.shape[1] != d:
            raise ValueError(f"query dim {xq.shape[1]} != index dim {d}")

        k_eff = int(min(K, max(n, 1)))
        # Regime-based planning for IVF (measured on v5e, docs/benchmarks.md):
        # - block-aligned index on TPU: the Pallas grouped probe
        #   (scalar-prefetched block DMA) at EVERY batch size.  Round 5
        #   tightened its static grid bound to p*max_blocks, after which it
        #   beats the window probe 10-150x at small batch too (10M store,
        #   B=1: 5.0 ms vs 53 ms; 200k, B=64: 1.5 ms vs 222 ms — device-side,
        #   equal recall; tools_dev/exp_smallbatch_probe.py) — the window
        #   probe's (B, nprobe*window, d) gather slab is what made it
        #   "latency-optimal" only in theory.
        # - small batch otherwise (or with pallas dropped by calibration):
        #   the window probe (reads only the probed lists).
        # - large batch otherwise: the exhaustive approx_max_k scan, which
        #   amortizes one database pass over the batch; the XLA grouped
        #   probe (ivf_search_grouped) stays available explicitly but is
        #   gather-bound (15k QPS at the same config).
        # - ids-restricted searches on IVF gather just the allowed rows and
        #   scan them exactly (no second full-size array); on flat indexes
        #   the scan array doubles as the index and a mask suffices.
        if meta["kind"] == "ivf" and ids is not None:
            # Subset-gather works from the IVF storage directly — including
            # under a mesh (the gathered O(|ids| x d) slab is tiny next to the
            # round-1/2 fallback of re-materializing a full flat copy).
            # Shard-only states (config-5 reload) gather from disk instead.
            if "ivf_vectors" in state:
                dists, idx = self._ivf_subset_search(state, jnp.asarray(xq), k_eff, ids)
            else:
                dists, idx = self._disk_subset_search(state, jnp.asarray(xq), k_eff, ids)
            return self._finish_output(dists, idx, xq, k_eff, K, ids, t_start)

        use_ivf = meta["kind"] == "ivf" and ids is None
        if use_ivf and self.recall_target is not None and "nprobe" not in kwargs:
            # Lazy autotune: first search calibrates (or reuses the entry
            # persisted in meta.json) and pins self.nprobe to the target.
            # Calibrated ONCE at a fixed k — recall@10, the standard ANN
            # operating metric (BASELINE config 4) — not per search K:
            # keying on k_eff would rerun the full-probe oracle inline for
            # every distinct K a caller passes.  For a different contract,
            # call calibrate_nprobe(k=...) explicitly.
            self.calibrate_nprobe(self.recall_target, k=min(10, max(n, 1)))
        use_pallas = False
        if use_ivf:
            nlist = int(meta.get("nlist", 1))
            nprobe_planned = int(kwargs.get("nprobe", self.nprobe))
            if self._pallas_eligible(meta) and "pallas" not in self._regimes_dropped:
                use_ivf = False
                use_pallas = True
            elif xq.shape[0] * max(nprobe_planned, 1) >= nlist:
                use_ivf = False  # exhaustive-scan fallback (no aligned probe)
        if use_pallas or use_ivf:
            nprobe = int(kwargs.get("nprobe", self.nprobe))
            dists, idx = self._probe_ivf(
                state, xq, k_eff, nprobe, use_pallas=use_pallas,
                rescore=kwargs.get("rescore", self.rescore),
                int8_queries=kwargs.get("int8_queries", self.int8_queries),
                query_chunk=kwargs.get("query_chunk", self.query_chunk),
            )
        else:
            # Exhaustive scan path (flat indexes, ids-restricted searches,
            # and the large-batch IVF regime). Materialized lazily for IVF.
            self._ensure_flat_arrays(state)
            valid = None
            if ids is not None:
                mask = np.zeros(state["xb"].shape[0], dtype=bool)
                mask[np.asarray(ids, dtype=np.int64)] = True
                valid = jnp.asarray(mask)

            if "xb_sharded" in state:
                from lotus_tpu.parallel import shard_rows, sharded_flat_search

                sharded_valid = None
                if valid is not None:
                    pad_n = state["xb_sharded"].shape[0]
                    mask_pad = np.zeros(pad_n, dtype=bool)
                    mask_pad[: valid.shape[0]] = np.asarray(valid)
                    sharded_valid, _ = shard_rows(
                        jnp.asarray(mask_pad)[:, None], self.mesh, block_rows=self.block_rows
                    )
                    sharded_valid = sharded_valid[:, 0]
                dists, idx = sharded_flat_search(
                    state["xb_sharded"], jnp.asarray(xq), k_eff,
                    n_rows=n, metric=meta["metric"], mesh=self.mesh,
                    valid=sharded_valid, block_rows=self.block_rows, approx=self.approx,
                    xb_scales=state.get("xb_scales_sharded"),
                )
            else:
                xb = state["xb"]
                xq_dev = jnp.asarray(xq)
                on_tpu = jax.default_backend() == "tpu" or self._pallas_interpret
                # int8 flat scans get exact top-k rescoring by default: the
                # same trick as the IVF path, worth ~2 recall points at the
                # top-k boundary for O(B x rescore x d) extra FLOPs.
                rescore = kwargs.get("rescore", self.rescore)
                if rescore is None and xb.dtype == jnp.int8:
                    rescore = 32
                do_rescore = (
                    rescore is not None and xb.dtype == jnp.int8
                    and meta["metric"] in ("ip", "cosine") and on_tpu
                )
                k_cand = max(k_eff, int(rescore)) if do_rescore else k_eff
                scan = kwargs.get("scan", self.scan)
                use_pallas_flat = (
                    on_tpu and valid is None and meta["metric"] in ("ip", "cosine")
                    and xb.shape[0] % 1024 == 0
                    and (
                        scan == "pallas"
                        or (
                            scan == "auto" and self.approx and xq.shape[0] >= 256
                            and xb.dtype == jnp.bfloat16
                        )
                    )
                )
                if use_pallas_flat:
                    from lotus_tpu.ops.pallas_flat import flat_search_pallas

                    dists, idx = flat_search_pallas(
                        xb, xq_dev, k_cand, n_rows=n,
                        xb_scales=state.get("xb_scales"),
                        interpret=self._pallas_interpret,
                    )
                else:
                    dists, idx = flat_search(
                        xb, xq_dev, k_cand,
                        metric=meta["metric"], n_rows=n, valid=valid,
                        xb_norms_sq=state["xb_norms_sq"],
                        block_rows=self.block_rows, approx=self.approx,
                        xb_scales=state.get("xb_scales"),
                    )
                if do_rescore:
                    from lotus_tpu.ops.flat import flat_rescore

                    dists, idx = flat_rescore(
                        xb, xq_dev, idx, k_eff, xb_scales=state.get("xb_scales")
                    )
                else:
                    dists, idx = dists[:, :k_eff], idx[:, :k_eff]

        return self._finish_output(dists, idx, xq, k_eff, K, ids, t_start)

    def _finish_output(
        self,
        dists: jnp.ndarray,
        idx: jnp.ndarray,
        xq: np.ndarray,
        k_eff: int,
        K: int,
        ids: list[int] | None,
        t_start: float,
    ) -> RMOutput:
        import time as _time

        # np.asarray materializes the device result, so the wall-time stat
        # below covers the full search INCLUDING the device->host transfer
        # (honest end-to-end time; per-kernel timing belongs to bench.py's
        # chained methodology, see its docstring).
        dists_np = np.asarray(dists, dtype=np.float64)
        idx_np = fetch_int32(idx).astype(np.int64)
        self.stats["searches"] += 1
        self.stats["queries"] += int(xq.shape[0])
        if ids is not None:
            self.stats["subset_searches"] += 1
        self.stats["total_wall_s"] = self.stats.get("total_wall_s", 0.0) + (
            _time.perf_counter() - t_start
        )
        if k_eff < K:  # faiss-style -1 padding when K exceeds the collection
            pad = K - k_eff
            dists_np = np.pad(dists_np, ((0, 0), (0, pad)), constant_values=0.0)
            idx_np = np.pad(idx_np, ((0, 0), (0, pad)), constant_values=-1)
        return RMOutput(distances=dists_np.tolist(), indices=idx_np.tolist())

    # ------------------------------------------------------------------- misc
    def get_vectors_from_index(self, index_dir: str, ids: list[int]) -> NDArray[np.float64]:
        vecs = index_io.read_array(index_dir, "vectors")
        return np.asarray(vecs[np.asarray(ids, dtype=np.int64)])

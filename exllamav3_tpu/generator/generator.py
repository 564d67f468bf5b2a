"""Generator: continuous dynamic batching over a paged KV cache.

Feature reference: /root/reference/exllamav3/generator/generator.py
(Generator:22, iterate:339, iterate_gen:758, generate():1199). TPU redesign:

  * decode runs as ONE jitted step per iteration — model forward + fused
    batch sampler + token-count update — over static (batch-bucket,
    max-pages-bucket) shapes; only the sampled tokens cross to host.
  * prefill is chunked (bucketed lengths) per job, skipping pages served by
    the content-hash prefix cache (pagetable.py).
  * per-job sampler settings become per-row parameter arrays
    (batch_sampler.py) so heterogeneous jobs share one compiled step.
  * stop tokens / stop strings / detokenization / queueing stay host-side,
    exactly as the reference does.

The "slot" system gives every active job a stable row in persistent device
buffers (token counts), the analogue of the reference's CUDA-graph slot
stability requirements.
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import PAGE_SIZE
from .job import Job
from .pagetable import PageTable, _page_hash
from .batch_sampler import BatchSamplerParams, batch_sample
from .sampler import SS_AdaptiveP


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class Generator:
    def __init__(
        self,
        model,
        cache,
        tokenizer=None,
        max_batch_size: int = 32,
        max_chunk_size: int = 2048,
        seed: int = 0,
        k_bits: int = 0,
        v_bits: int = 0,
        draft_model=None,
        draft_cache=None,
        num_draft_tokens: int = 4,
        use_ngram_draft: bool = False,
        mtp_model=None,
        cpu_cache_bytes: int = 0,
        recurrent_cache_bytes: int = 0,  # host-RAM stash budget (0 = 4 GB)
        sp_mesh=None,
        sp_axis: str = "sp",
        mh_broadcast: bool = False,
        decode_burst: int = 8,
    ):
        self.model = model
        self.cache = cache
        self.tokenizer = tokenizer
        self.max_batch_size = max_batch_size
        self.max_chunk_size = max_chunk_size
        # multi-step decode: scan up to N plain decode steps per dispatch
        # (one host/tunnel round-trip per N tokens); _burst_n gates it to
        # output-identical situations. EXL3TPU_DECODE_BURST overrides.
        from ..util.env import env_int

        self.decode_burst = max(1, env_int("EXL3TPU_DECODE_BURST",
                                           decode_burst))
        # burst cap while prefill work exists (active chunks or queued jobs):
        # prefill chunks dispatch asynchronously every host iteration, so a
        # bounded burst trades a little TTFT for n-fold fewer host/tunnel
        # round-trips under MIXED loads. EXL3TPU_PREFILL_BURST overrides.
        self.prefill_burst = max(1, env_int("EXL3TPU_PREFILL_BURST", 4))
        # cache quantization defaults come from the cache's own spec; the
        # explicit args remain as an override
        # sequence-parallel serving: shard the paged cache's page dim over
        # the mesh's sp axis; attention merges per-device stats (parallel/sp.py)
        self.sp_mesh = sp_mesh
        self.sp_axis = sp_axis
        # multi-host serving: route sampled tokens through a host-0
        # broadcast so every process feeds identical next-step inputs
        # (parallel/multihost.py discipline)
        self.mh_broadcast = mh_broadcast
        if sp_mesh is not None:
            from ..parallel.sp import shard_cache_state

            cache.state = shard_cache_state(cache.state, sp_mesh, sp_axis)
        spec = getattr(cache, "spec", None)
        self.k_bits = k_bits or (spec.k_bits if spec else 0)
        self.v_bits = v_bits or (spec.v_bits if spec else 0)
        self.compand_a = getattr(spec, "compand_a", 0.0) if spec else 0.0
        # speculative decoding (draft model and/or suffix-automaton n-gram;
        # reference generator.py:475-743). Greedy verification: used when
        # every running job samples greedily, exact-output-preserving.
        self.draft_model = draft_model
        self.draft_cache = draft_cache
        self.num_draft_tokens = num_draft_tokens
        self.use_ngram_draft = use_ngram_draft
        self.num_drafted = 0
        self.num_accepted = 0
        self._sd_fns = {}
        # DFlash block-diffusion drafter (reference generator.py:639): the
        # draft's KV context is built from captured target hidden states
        self.dflash_model = None
        if draft_model is not None and draft_model.caps.get("dflash_draft"):
            self.dflash_model = draft_model
            draft_model = self.draft_model = None
            self.dflash_model.attach(model)
            from ..model.cache import Cache as _C, CacheSpec as _CS

            self.dflash_cache = _C(self.dflash_model, _CS(
                layout="paged", num_pages=cache.spec.num_pages))
            self._dflash_fns = {}

        # MTP draft head (reference generator.py:568 iterate_draftmodel_mtp):
        # its own paged cache shares the job's page indices/positions
        self.mtp_model = mtp_model
        self.mtp_cache = None
        self._mtp_fns = {}
        if mtp_model is not None:
            mtp_model.attach(model)
            from ..model.cache import Cache as _Cache, CacheSpec as _Spec

            self.mtp_cache = _Cache(mtp_model, _Spec(
                layout="paged", num_pages=cache.spec.num_pages))

        # recurrent-state layers (GDN/Mamba2): state advances destructively,
        # so prefix-page reuse and speculative rewind are off for these models
        self.has_recurrent = any(
            getattr(m, "is_recurrent", False) for m in model.root.walk())
        # MRoPE models need 3-stream rope positions once a job carries an
        # image grid (text-only degenerates to standard rope and is exact)
        self.uses_mrope = any(
            getattr(getattr(m, "rope", None), "mrope_sections", None)
            for m in model.root.walk())
        # SWA ring caches also key state by stable per-job slots (but are
        # position-keyed, so they need no speculative rewind history)
        self.ring_keys: list = []
        if cache.spec.swa_ring:
            self.ring_keys = [
                m.key for m in model.root.walk()
                if getattr(m, "is_kv_cache_user", False)
                and getattr(m, "sliding_window", 0)
                and not getattr(m, "is_recurrent", False)]
        self.has_recurrent = self.has_recurrent or bool(self.ring_keys)
        if self.has_recurrent:
            # speculative rejection rewinds via per-step state history
            # (reference: batched conv/state rewind jobs, gdn.cu). A
            # recurrent DRAFT model has no such path — disable just that.
            if self.draft_model is not None and any(
                    getattr(m, "is_recurrent", False)
                    for m in self.draft_model.root.walk()):
                self.draft_model = None
            self.recurrent_keys = [m.key for m in model.root.walk()
                                   if getattr(m, "is_recurrent", False)]
            first_layer = cache.state[
                (self.recurrent_keys + self.ring_keys)[0]]
            n_slots = next(iter(first_layer.values())).shape[0]
            assert n_slots >= max_batch_size + 1, (
                f"recurrent cache has {n_slots} state slots; need "
                f"max_batch_size+1 = {max_batch_size + 1} "
                f"(set CacheSpec.recurrent_slots)")

        num_pages = cache.spec.num_pages
        assert cache.spec.layout == "paged", "Generator requires a paged cache"
        # dflash needs target hiddens for every cached position, so prefix
        # reuse (which skips target forwards) is off for it too
        self.pagetable = PageTable(
            num_pages,
            disable_reuse=self.has_recurrent or self.dflash_model is not None)

        # host-RAM second-tier page cache (reference generator/cpu_cache.py)
        self.cpu_cache = None
        self.recurrent_cache_bytes = recurrent_cache_bytes
        if cpu_cache_bytes and not self.has_recurrent:
            from .cpu_cache import CPUPageCache

            self.cpu_cache = CPUPageCache(cpu_cache_bytes)
            self.pagetable.evict_cb = (
                lambda h, idx: self.cpu_cache.put(h, self.cache.state, idx))
            self.pagetable.restore_cb = (
                lambda h, idx: self.cpu_cache.restore(h, self.cache.state, idx))

        self.pending: list[Job] = []
        self.active: list[Job] = []
        self._rstash = None  # host-RAM recurrent-state stash (model/recurrent.py)
        self.job_slots: dict = {}  # job -> slot
        self.free_slots = list(range(max_batch_size))

        vocab = model.config.vocab_size
        # +1 scrap row absorbs count updates from padded batch rows
        self.token_counts = jnp.zeros((max_batch_size + 1, vocab), dtype=jnp.int32)
        self.key = jax.random.PRNGKey(seed)

        self.batch_buckets = [1, 2, 4, 8, 16, 32, 64]
        # intermediate prefill buckets matter for TTFT: chunks serialize on
        # the cache state, so a 750-token prompt padded to a 2048 bucket
        # costs 2.7x its device time; 512/1024 rungs cut the padding waste
        # at the price of one extra XLA compile per rung actually used
        self.prefill_buckets = sorted({32, 256, 512, 1024, max_chunk_size}
                                      - {b for b in (512, 1024)
                                         if b > max_chunk_size})
        self.pages_buckets = [4, 16, 64, 256, 1024, 4096]
        self._decode_fns = {}
        self._prefill_step = None

    # -- public API ------------------------------------------------------

    def enqueue(self, job: Job | list):
        jobs = job if isinstance(job, list) else [job]
        for j in jobs:
            j.time_enqueued = time.time()
            j.status = "queued"
            self.pending.append(j)
        return [j.identifier for j in jobs]

    def cancel(self, job: Job):
        if job in self.pending:
            self.pending.remove(job)
        elif job in self.active:
            self._finish_job(job, "cancelled")

    def requeue(self, job: Job):
        """Pause an active job back to the pending queue (reference job.py
        rq_state :920-983). Attention-only models release the job's pages
        (prefix hashes revive them on resume, else prefill re-runs);
        recurrent-state models keep pages and stash the state slot to host
        RAM, restoring it on re-admission."""
        if job not in self.active:
            return
        self.active.remove(job)
        slot = self.job_slots.pop(job)
        self.free_slots.append(slot)
        if self.has_recurrent:
            if self._rstash is None:
                from ..model.recurrent import RecurrentStateCache

                self._rstash = RecurrentStateCache(
                    self.recurrent_cache_bytes or (4 << 30))
            job.rq_handle = self._rstash.stash(
                self.cache.state, self.recurrent_keys + self.ring_keys,
                slot, job.seq_len)
            # everything but the newest token has flowed through the
            # recurrent state; resume must not re-feed those tokens
            job.prefill_done = job.seq_len - 1
        else:
            self.pagetable.release_sequence(job.pages)
            job.pages = []
            job.page_hashes = []
            job.prefill_done = 0
            job.cached_tokens = 0
        job.status = "queued"
        self.pending.append(job)

    def num_remaining_jobs(self) -> int:
        return len(self.pending) + len(self.active)

    def generate(self, prompt_ids, max_new_tokens=128, sampler=None,
                 stop_conditions=None, decode_text=True):
        """Blocking convenience: list of prompts -> list of completions."""
        single = not isinstance(prompt_ids, list)
        prompts = [prompt_ids] if single else prompt_ids
        jobs = [
            Job(p, max_new_tokens=max_new_tokens, sampler=sampler,
                stop_conditions=stop_conditions)
            for p in prompts
        ]
        order = {j.identifier: i for i, j in enumerate(jobs)}
        self.enqueue(jobs)
        texts = [""] * len(jobs)
        tokens: list = [None] * len(jobs)
        while self.num_remaining_jobs():
            for r in self.iterate():
                i = order.get(r["identifier"])
                if i is None:
                    continue
                texts[i] += r.get("text", "")
                if r["stage"] == "finished":
                    tokens[i] = r["new_tokens"]
        if decode_text and self.tokenizer is not None:
            out = texts
        else:
            out = tokens
        return out[0] if single else out

    # -- scheduling ----------------------------------------------------------

    def iterate(self) -> list:
        """Run one generator iteration; returns a list of result events."""
        results: list = []
        self._admit_jobs(results)
        # Prefill and decode share each iteration (reference generator.py:
        # 339-444 runs prefill rounds AND the batched decode forward in one
        # pass). All prefilling jobs draw from a per-iteration token budget,
        # so one long prompt cannot starve either other prompts or decode.
        prefilling = [j for j in self.active if j.status == "prefill"]
        budget = self.max_chunk_size
        for job in prefilling:
            if budget <= 0:
                break
            budget -= self._prefill_job(job, results, budget)
        running = [j for j in self.active if j.status == "running"]
        if running:
            greedy = all(j.sampler.greedy for j in running) and not any(
                j.cfg_scale is not None for j in running)
            # MTP/DFlash fast paths verify with raw argmax; constrained jobs
            # need per-position filter masks, which the draft/n-gram SD path
            # and the plain batch path apply
            filtered = any(j.filters for j in running)
            if self.dflash_model is not None and greedy and not filtered:
                self._decode_batch_dflash(running, results)
            elif self.mtp_model is not None and greedy and not filtered:
                self._decode_batch_mtp(running, results)
            elif (self.draft_model is not None or self.use_ngram_draft) and greedy:
                self._decode_batch_sd(running, results)
            else:
                # mixed load: burst the plain-job majority in one multi-step
                # dispatch while host-coupled jobs (filters/bans/healing)
                # step singly in a second dispatch — both update disjoint
                # cache rows, so splitting is output-identical
                single = [j for j in running if self._needs_single_step(j)]
                if self.decode_burst > 1 and single and len(single) < len(running):
                    plain = [j for j in running if not self._needs_single_step(j)]
                    self._decode_batch(plain, results)
                    self._decode_batch([j for j in single if j.status == "running"],
                                       results)
                else:
                    self._decode_batch(running, results)
        if results and not self.active and not self.pending:
            self.defrag()  # queue drained (reference generator.py:444)
        return results

    # -- admission -------------------------------------------------------------

    def _admit_jobs(self, results: list):
        while self.pending and self.free_slots:
            job = self.pending[0]
            resume = bool(job.pages)  # requeued recurrent job kept its pages
            if not resume:
                # token healing: re-predict the last prompt token constrained
                # to extensions of its text (reference job.py token healing)
                if (job.token_healing and job.healing_prefix is None
                        and self.tokenizer is not None and len(job.input_ids) > 1):
                    last = int(job.input_ids[-1])
                    job.healing_prefix = self.tokenizer.decode([last])
                    job.input_ids = job.input_ids[:-1]
                # fail fast on jobs that can never fit (prompt + 1 decode page)
                if job.pages_needed() + 1 > self.pagetable.num_pages - 1:
                    self.pending.pop(0)
                    job.status = "finished"
                    job.eos_reason = "too_long"
                    results.append({
                        "identifier": job.identifier, "stage": "finished",
                        "job": job, "eos_reason": "too_long", "new_tokens": [],
                        "full_text": "",
                    })
                    continue
                alloc = self.pagetable.allocate_sequence(job.all_ids())
                if alloc is None:
                    break  # no pages free
                if job.cfg_scale is not None:
                    alloc_neg = self.pagetable.allocate_sequence(
                        job.all_ids_neg())
                    if alloc_neg is None:
                        self.pagetable.release_sequence(alloc[0])
                        break
                    job.pages_neg = alloc_neg[0]
                    job.prefill_done_neg = min(alloc_neg[1],
                                               job.seq_len_neg - 1)
                pages, reused = alloc
                self.pending.pop(0)
                job.pages = pages
                job.cached_tokens = reused
                job.prefill_done = min(reused, job.seq_len - 1)
                job.page_hashes = self._hash_chain(job)
                for f in job.filters:
                    f.begin(self.tokenizer)
            else:
                self.pending.pop(0)
            job.status = "prefill"
            job.time_prefill_start = time.time()
            self.active.append(job)
            self.job_slots[job] = self.free_slots.pop(0)
            slot = self.job_slots[job]
            if self.has_recurrent:
                # the slot may have been used by a finished job: clear it
                # (ring position arrays clear to -1 = "never written")
                for k in self.recurrent_keys + self.ring_keys:
                    layer = self.cache.state[k]
                    # pg_* arrays are page-indexed pools (DSV4), not per-slot
                    self.cache.state[k] = {
                        n: a if n.startswith("pg_")
                        else a.at[slot].set(-1 if n == "pos" else 0)
                        for n, a in layer.items()
                    }
                if getattr(job, "rq_handle", None):
                    self._rstash.unstash(job.rq_handle, self.cache.state, slot)
                    job.rq_handle = None
            # seed penalty counts from the prompt (+ prior output on resume)
            counts = np.zeros(self.model.config.vocab_size, dtype=np.int32)
            np.add.at(counts, job.all_ids() % counts.size, 1)
            self.token_counts = self.token_counts.at[slot].set(jnp.asarray(counts))
            results.append({
                "identifier": job.identifier, "stage": "started", "job": job,
                "cached_tokens": job.cached_tokens,
            })

    def _hash_chain(self, job: Job):
        hashes: list = []
        prev = None
        ids = job.all_ids()
        for pi in range(len(job.pages)):
            a, b = pi * PAGE_SIZE, min((pi + 1) * PAGE_SIZE, len(ids))
            if b - a == PAGE_SIZE:
                prev = _page_hash(prev, ids[a:b])
                hashes.append(prev)
            else:
                hashes.append(None)
        return hashes

    # -- prefill -----------------------------------------------------------------

    def _prefill_job(self, job: Job, results: list, budget: int | None = None) -> int:
        """Prefill up to min(budget, max_chunk_size) tokens; returns tokens
        consumed so iterate() can spread one budget across all prefilling
        jobs."""
        ids = job.all_ids()  # prompt (+ prior output when resuming a requeue)
        # all but the last token go through prefill; the last token is fed by
        # the first decode step so its logits produce the first sample
        end = len(ids) - 1
        start = job.prefill_done
        chunk = min(self.max_chunk_size, end - start)
        if budget is not None:
            chunk = min(chunk, budget)
        if chunk > 0:
            s_bucket = _bucket(chunk, self.prefill_buckets)
            mp_bucket = _bucket(len(job.pages), self.pages_buckets)
            step = self._get_prefill_fn()
            seg = ids[start : start + chunk]
            if job.embeddings:
                # remap >=1e9 dynamic mm ids into [vocab, vocab + n) int32
                from ..tokenizer.mm_embedding import FIRST_MM_EMBEDDING_INDEX

                base = min(e.first_index for e in job.embeddings)
                vocab = self.model.config.vocab_size
                seg = np.where(seg >= FIRST_MM_EMBEDDING_INDEX,
                               vocab + (seg - base), seg)
            ids_pad = np.zeros((1, s_bucket), np.int32)
            ids_pad[0, :chunk] = seg
            pos = np.full((1, s_bucket), 0, np.int32)
            pos[0, :chunk] = np.arange(start, start + chunk, dtype=np.int32)
            # padded positions park in the scratch column (page 0)
            pos[0, chunk:] = mp_bucket * PAGE_SIZE
            mrope3 = None
            if self.uses_mrope and job.embeddings and any(
                    e.grid_thw for e in job.embeddings):
                if getattr(job, "_mrope_streams", None) is None:
                    from ..tokenizer.mm_embedding import mrope_position_streams

                    job._mrope_streams, job.mrope_delta = \
                        mrope_position_streams(ids, job.embeddings)
                m3 = np.broadcast_to(pos[0][:, None], (s_bucket, 3)).copy()
                m3[:chunk] = job._mrope_streams[start : start + chunk]
                mrope3 = jnp.asarray(m3[None])
            bt = np.zeros((1, mp_bucket + 1), np.int32)
            bt[0, : len(job.pages)] = job.pages
            slots1 = (jnp.asarray([self.job_slots[job]], dtype=jnp.int32)
                      if self.has_recurrent else None)
            mm_table = mm_base = None
            if job.embeddings:
                from ..tokenizer.mm_embedding import build_mm_table

                n_mm = sum(e.mm_length for e in job.embeddings)
                pad = ((n_mm + 255) // 256) * 256  # bucket to avoid recompiles
                tbl, _ = build_mm_table(job.embeddings,
                                        self.model.config.hidden_size,
                                        pad_to=pad)
                mm_table = jnp.asarray(tbl, dtype=jnp.bfloat16)
            if self.dflash_model is not None:
                step = self._get_capture_fn()
                _, caps, self.cache.state = step(
                    self.model.params, jnp.asarray(ids_pad), self.cache.state,
                    jnp.asarray(pos), jnp.asarray(np.array([start], np.int32)),
                    jnp.asarray(bt), slots1, mm_table,
                )
                self._dflash_update(job, [c[:, :chunk] for c in caps],
                                    np.arange(start, start + chunk))
                if start + chunk >= end:
                    job.dflash_ready = True
            elif self.mtp_model is not None:
                step = self._get_prefill_fn(hidden=True)
                _, hid, self.cache.state = step(
                    self.model.params, jnp.asarray(ids_pad), self.cache.state,
                    jnp.asarray(pos), jnp.asarray(np.array([start], np.int32)),
                    jnp.asarray(bt), slots1, mm_table,
                )
                # sync the MTP cache: position p takes (token p+1, hidden p)
                hid = np.asarray(hid[0, :chunk], dtype=np.float32)
                self._mtp_sync(job, ids[start + 1 : start + chunk + 1],
                               hid, np.arange(start, start + chunk))
            else:
                _, self.cache.state = step(
                    self.model.params, jnp.asarray(ids_pad), self.cache.state,
                    jnp.asarray(pos), jnp.asarray(np.array([start], np.int32)),
                    jnp.asarray(bt), slots1, mm_table, mrope3,
                )
            job.prefill_done = start + chunk
        neg_done = True
        if job.cfg_scale is not None and job.prefill_done >= end:
            neg_done = self._prefill_negative(job)
        if job.prefill_done >= end and neg_done:
            job.status = "running"
            job.time_prefill_end = time.time()
            self._finalize_full_pages(job, upto=end)
        results.append({
            "identifier": job.identifier, "stage": "prefill", "job": job,
            "curr_progress": job.prefill_done, "max_progress": end,
        })
        return chunk

    def _prefill_negative(self, job: Job) -> bool:
        """Prefill one chunk of the CFG negative sequence; True when done."""
        ids = job.all_ids_neg()
        end = len(ids) - 1
        start = job.prefill_done_neg
        chunk = min(self.max_chunk_size, end - start)
        if chunk > 0:
            s_bucket = _bucket(chunk, self.prefill_buckets)
            mp_bucket = _bucket(len(job.pages_neg), self.pages_buckets)
            step = self._get_prefill_fn()
            ids_pad = np.zeros((1, s_bucket), np.int32)
            ids_pad[0, :chunk] = ids[start : start + chunk]
            pos = np.full((1, s_bucket), mp_bucket * PAGE_SIZE, np.int32)
            pos[0, :chunk] = np.arange(start, start + chunk, dtype=np.int32)
            bt = np.zeros((1, mp_bucket + 1), np.int32)
            bt[0, : len(job.pages_neg)] = job.pages_neg
            _, self.cache.state = step(
                self.model.params, jnp.asarray(ids_pad), self.cache.state,
                jnp.asarray(pos), jnp.asarray(np.array([start], np.int32)),
                jnp.asarray(bt), None, None,
            )
            job.prefill_done_neg = start + chunk
        return job.prefill_done_neg >= end

    def _finalize_full_pages(self, job: Job, upto: int):
        """Register pages fully written by prefill for prefix reuse."""
        ids = job.input_ids
        prev = None
        for pi in range(len(job.pages)):
            a, b = pi * PAGE_SIZE, (pi + 1) * PAGE_SIZE
            if b <= upto:
                if job.page_hashes[pi] is not None:
                    self.pagetable.finalize_page(job.pages[pi], prev, ids[a:b])
                    prev = job.page_hashes[pi]
            else:
                break

    # -- decode --------------------------------------------------------------------

    def _get_prefill_fn(self, hidden: bool = False, history: bool = False):
        key = ("prefill", hidden, history)
        if key not in self._decode_fns:
            fn = self.model.step_fn("paged", k_bits=self.k_bits, compand_a=self.compand_a, sp_mesh=self.sp_mesh, sp_axis=self.sp_axis,
                                    v_bits=self.v_bits, return_hidden=hidden,
                                    recurrent_history=history)
            self._decode_fns[key] = jax.jit(fn, donate_argnums=(2,))
        return self._decode_fns[key]

    def _rewind_recurrent(self, job, row: int, accepted: int, rec_hist: dict):
        """Set the job's recurrent state to the snapshot after its last
        VALID verify token (position T-1+accepted)."""
        slot = self.job_slots[job]
        for k in self.recurrent_keys:
            layer = dict(self.cache.state[k])
            h = rec_hist[k]
            if "S" in layer and "S" in h:
                layer["S"] = layer["S"].at[slot].set(h["S"][row, accepted])
            layer["conv"] = layer["conv"].at[slot].set(h["conv"][row, accepted])
            self.cache.state[k] = layer

    def _get_capture_fn(self):
        key = ("capture",)
        if key not in self._decode_fns:
            fn = self.model.step_fn(
                "paged", k_bits=self.k_bits, compand_a=self.compand_a, sp_mesh=self.sp_mesh, sp_axis=self.sp_axis, v_bits=self.v_bits,
                capture_layers=tuple(self.dflash_model.target_layer_ids))
            self._decode_fns[key] = jax.jit(fn, donate_argnums=(2,))
        return self._decode_fns[key]

    def _dflash_update(self, job, caps, positions):
        """Write target hiddens (list of (1|B, S, h) slices already cut to
        the job row) into the DFlash context cache at `positions`."""
        if "update" not in self._dflash_fns:
            self._dflash_fns["update"] = jax.jit(self.dflash_model.update_fn())
        th = jnp.concatenate([c.astype(jnp.float32) for c in caps], axis=-1)
        S = th.shape[1]
        mp_bucket = _bucket(len(job.pages), self.pages_buckets)
        bt = np.zeros((1, mp_bucket + 1), np.int32)
        bt[0, : len(job.pages)] = job.pages
        pos = np.full((1, S), mp_bucket * PAGE_SIZE, np.int32)
        n = len(positions)
        pos[0, :n] = positions
        self.dflash_cache.state = self._dflash_fns["update"](
            self.dflash_model.params, th, self.dflash_cache.state,
            jnp.asarray(pos), jnp.asarray(bt),
            jnp.asarray(np.array([int(positions[0])], np.int32)))

    def _decode_batch_dflash(self, jobs: list, results: list):
        """Block-diffusion speculative decode: one DFlash forward drafts the
        whole block; the target verifies and its captured hiddens extend the
        DFlash context for the accepted run."""
        bs = self.dflash_model.block_size
        k = min(self.num_draft_tokens, bs - 1)
        for job in list(jobs):
            need = (job.seq_len + bs + 1 + PAGE_SIZE - 1) // PAGE_SIZE
            while len(job.pages) < need:
                newp = self.pagetable.extend_sequence(job.pages)
                if newp is None:
                    self._finish_job(job, "cache_overflow", results)
                    jobs.remove(job)
                    break
                job.pages.append(newp)
                job.page_hashes.append(None)
        if not jobs:
            return

        if "draft" not in self._dflash_fns:
            self._dflash_fns["draft"] = jax.jit(self.dflash_model.draft_fn())

        drafts = []
        for job in jobs:
            if not getattr(job, "dflash_ready", False):
                drafts.append([])
                continue
            T = job.seq_len
            last = job.new_tokens[-1] if job.new_tokens else job.input_ids[-1]
            ids = np.full((1, bs), self.dflash_model.mask_token_id, np.int32)
            ids[0, 0] = int(last)
            pos = np.arange(T - 1, T - 1 + bs, dtype=np.int32)[None]
            mp_bucket = _bucket(len(job.pages), self.pages_buckets)
            bt = np.zeros((1, mp_bucket + 1), np.int32)
            bt[0, : len(job.pages)] = job.pages
            out = self._dflash_fns["draft"](
                self.model.params, self.dflash_model.params, jnp.asarray(ids),
                self.dflash_cache.state, jnp.asarray(pos), jnp.asarray(bt))
            kk = k
            if isinstance(out, tuple):
                # DSpark: confidence head caps the usable draft length
                out, keep = out
                kk = min(k, int(np.asarray(keep)[0]))
            drafts.append([int(t) for t in np.asarray(out[0, :kk])])
        self.num_drafted += sum(len(d) for d in drafts)

        B = _bucket(len(jobs), self.batch_buckets)
        mp = max(len(j.pages) for j in jobs)
        mp_bucket = _bucket(mp, self.pages_buckets)
        S = k + 1
        ids = np.zeros((B, S), np.int32)
        pos = np.full((B, S), mp_bucket * PAGE_SIZE, np.int32)
        bt = np.zeros((B, mp_bucket + 1), np.int32)
        seqlens = np.zeros(B, np.int32)
        slots = np.full(B, self.max_batch_size, np.int32)
        for i, job in enumerate(jobs):
            last = job.new_tokens[-1] if job.new_tokens else job.input_ids[-1]
            row = [int(last)] + list(drafts[i]) + [0] * (k - len(drafts[i]))
            ids[i] = row[:S]
            pos[i] = np.arange(job.seq_len - 1, job.seq_len - 1 + S)
            bt[i, : len(job.pages)] = job.pages
            seqlens[i] = job.seq_len - 1
            if self.has_recurrent:
                slots[i] = self.job_slots[job]

        step = self._get_capture_fn()
        logits, caps, self.cache.state = step(
            self.model.params, jnp.asarray(ids), self.cache.state,
            jnp.asarray(pos), jnp.asarray(seqlens), jnp.asarray(bt),
            jnp.asarray(slots) if self.has_recurrent else None,
        )
        out = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int64)

        for i, job in enumerate(jobs):
            d = drafts[i]
            T = job.seq_len
            accepted = 0
            for j in range(len(d)):
                if out[i, j] == d[j]:
                    accepted += 1
                else:
                    break
            self.num_accepted += accepted
            job.accepted_draft_tokens += accepted
            job.rejected_draft_tokens += len(d) - accepted
            # extend the DFlash context with hiddens of the valid run
            self._dflash_update(
                job, [c[i : i + 1, : accepted + 1] for c in caps],
                np.arange(T - 1, T + accepted))
            job.dflash_ready = True
            new = [int(out[i, j]) for j in range(accepted + 1)]
            for tok in new:
                if job.status != "running":
                    break
                n_before = len(job.new_tokens)
                self._receive_token(job, tok, results)
                if len(job.new_tokens) <= n_before:
                    # a banned-string rewind fired inside _receive_token:
                    # the remaining verified tokens were computed from the
                    # pre-rewind context — resample at the rewound position
                    break

    def _get_mtp_fn(self):
        if "mtp" not in self._mtp_fns:
            self._mtp_fns["mtp"] = jax.jit(self.mtp_model.mtp_step_fn("paged"))
        return self._mtp_fns["mtp"]

    def _mtp_sync(self, job, tokens, hiddens, positions):
        """Feed (token, hidden) pairs into the MTP cache; returns the last
        position's (logits, hidden) for draft chaining. tokens: (S,) int;
        hiddens: (S, H) f32; positions: (S,) int."""
        S = len(tokens)
        s_bucket = _bucket(S, [1, 2, 4, 8, 16, 32, 256, self.max_chunk_size])
        mp_bucket = _bucket(len(job.pages), self.pages_buckets)
        ids = np.zeros((1, s_bucket), np.int32)
        ids[0, :S] = tokens
        pos = np.full((1, s_bucket), mp_bucket * PAGE_SIZE, np.int32)
        pos[0, :S] = positions
        hid = np.zeros((1, s_bucket, hiddens.shape[-1]), np.float32)
        hid[0, :S] = hiddens
        bt = np.zeros((1, mp_bucket + 1), np.int32)
        bt[0, : len(job.pages)] = job.pages
        step = self._get_mtp_fn()
        logits, hidden, self.mtp_cache.state = step(
            self.model.params, self.mtp_model.params, jnp.asarray(ids),
            jnp.asarray(hid), self.mtp_cache.state, jnp.asarray(pos),
            jnp.asarray(np.array([int(positions[0])], np.int32)),
            jnp.asarray(bt))
        return (np.asarray(logits[0, S - 1]), np.asarray(hidden[0, S - 1]))

    def _mtp_drafts(self, job, k: int) -> list:
        """Sync pending (token, hidden) pairs, then chain-draft k tokens."""
        pend = getattr(job, "mtp_pend", None)
        if pend is None:
            return []
        tokens, hiddens, positions = pend
        logits, hidden = self._mtp_sync(job, tokens, hiddens, positions)
        job.mtp_pend = None
        drafts = [int(logits.argmax())]
        pos = int(positions[-1]) + 1
        for _ in range(k - 1):
            logits, hidden = self._mtp_sync(
                job, np.array([drafts[-1]]), hidden[None], np.array([pos]))
            drafts.append(int(logits.argmax()))
            pos += 1
        return drafts

    def _get_decode_fn(self, logprobs: bool = False):
        key = ("decode", logprobs)
        if key not in self._decode_fns:
            model_step = self.model.step_fn(
                "paged", k_bits=self.k_bits, compand_a=self.compand_a, sp_mesh=self.sp_mesh, sp_axis=self.sp_axis, v_bits=self.v_bits
            )

            def fn(params, ids, cache_state, positions, seqlens, block_tables,
                   sp, counts_full, slot_ids, rng, filter_mask=None,
                   cfg_pair=None, cfg_mix=None, mrope=None):
                logits, state = model_step(params, ids, cache_state, positions,
                                           seqlens, block_tables, slot_ids,
                                           None, mrope)
                last = logits[:, -1].astype(jnp.float32)
                if cfg_pair is not None:
                    # classifier-free guidance: l = l_neg + s * (l_pos - l_neg)
                    l_neg = last[cfg_pair]
                    last = l_neg + cfg_mix[:, None] * (last - l_neg)
                counts = counts_full[slot_ids]
                toks, tok_p = batch_sample(last, sp, counts, rng,
                                           filter_mask=filter_mask,
                                           return_probs=True)
                counts_full = counts_full.at[slot_ids, toks].add(1)
                if logprobs:
                    lsm = jax.nn.log_softmax(last, axis=-1)
                    lp_vals, lp_ids = jax.lax.top_k(lsm, 8)
                    return toks, tok_p, state, counts_full, lp_vals, lp_ids
                return toks, tok_p, state, counts_full

            self._decode_fns[key] = jax.jit(fn, donate_argnums=(2, 7))
        return self._decode_fns[key]

    def _get_burst_fn(self, logprobs: bool = False):
        """N decode steps in one dispatch: the sampled token feeds back
        device-side (lax.scan), so the host pays ONE dispatch round-trip per
        N tokens. Jobs that stop mid-burst keep stepping on device; the host
        truncates at the stop and reverses the discarded tokens' penalty
        counts — output-identical to single-step decode (gated in _burst_n
        to shapes where that holds)."""
        key = ("burst", logprobs)
        if key not in self._decode_fns:
            model_step = self.model.step_fn(
                "paged", k_bits=self.k_bits, compand_a=self.compand_a,
                sp_mesh=self.sp_mesh, sp_axis=self.sp_axis,
                v_bits=self.v_bits,
            )

            def fn(params, ids, cache_state, positions, seqlens, block_tables,
                   sp, counts_full, slot_ids, rng, feed, cfg_pair, cfg_mix,
                   mrope, n_steps):
                def body(carry, sub):
                    ids, state, counts_full, pos, sl, mr = carry
                    logits, state = model_step(params, ids, state, pos, sl,
                                               block_tables, slot_ids, None,
                                               mr)
                    last = logits[:, -1].astype(jnp.float32)
                    if cfg_pair is not None:
                        l_neg = last[cfg_pair]
                        last = l_neg + cfg_mix[:, None] * (last - l_neg)
                    counts = counts_full[slot_ids]
                    toks, tok_p = batch_sample(last, sp, counts, sub,
                                               return_probs=True)
                    counts_full2 = counts_full.at[slot_ids, toks].add(1)
                    out = (toks, tok_p)
                    if logprobs:
                        lsm = jax.nn.log_softmax(last, axis=-1)
                        out = out + tuple(jax.lax.top_k(lsm, 8))
                    nxt = toks[feed][:, None]
                    mr2 = None if mr is None else mr + 1
                    return (nxt, state, counts_full2, pos + 1, sl + 1, mr2), out

                subs = jax.random.split(rng, n_steps)
                carry = (ids, cache_state, counts_full, positions, seqlens,
                         mrope)
                (ids, state, counts_full, *_), outs = jax.lax.scan(
                    body, carry, subs)
                return outs, state, counts_full

            self._decode_fns[key] = jax.jit(
                fn, donate_argnums=(2, 7), static_argnames=("n_steps",))
        return self._decode_fns[key]

    @staticmethod
    def _needs_single_step(job) -> bool:
        """Jobs whose sampling needs the host between steps: constrained
        decoding (filter masks are host-computed per step), banned-string
        rewinds, per-step logits, pending token healing."""
        return bool(job.filters or job.banned_strings or job.pos_bans
                    or job.return_logits
                    or (job.healing_prefix and not job.new_tokens))

    def _burst_n(self, jobs: list) -> int:
        """Decode-burst length for this iteration: >1 only when a multi-step
        device scan is output-identical to stepping for every job in this
        batch (iterate() pre-splits mixed loads so the plain majority bursts
        while host-coupled jobs step singly). While prefill chunks are IN
        FLIGHT the burst caps at prefill_burst: chunks dispatch async each
        host iteration, so prefill still advances while the plain jobs
        amortize the host/tunnel round-trip. Merely-queued jobs do NOT cap
        the burst — iterate() admits before decoding, so a still-pending job
        means admission is blocked (no slot or no pages) and prefill could
        not advance this iteration anyway; capping for it only throws away
        burst amortization at full batch (saturated serving's steady state)."""
        n = self.decode_burst
        if n <= 1:
            return 1
        for job in jobs:
            if self._needs_single_step(job):
                return 1
        if any(j.status == "prefill" for j in self.active):
            n = min(n, self.prefill_burst)
        # normally the FULL burst length: jobs hitting max_new mid-burst just
        # truncate (their row keeps stepping at no extra batch cost), and a
        # single static n_steps means ONE compiled scan per shape bucket
        # instead of one per remaining-budget value. Exception: when jobs are
        # QUEUED and some active job will hit max_new inside the burst, its
        # slot frees mid-burst but admission waits for the scan to return —
        # cap at the next power of two >= the smallest remaining budget so a
        # finishing job releases its slot promptly (bounded compile count:
        # only pow2 n_steps values ever compile).
        if self.pending:
            rem = min((j.max_new_tokens - len(j.new_tokens) for j in jobs),
                      default=n)
            if rem < n:
                m = 1
                while m < rem:
                    m *= 2
                n = min(n, m)
        return n

    def _decode_batch(self, jobs: list, results: list):
        n_burst = self._burst_n(jobs)
        # grow pages for jobs crossing a boundary (CFG negatives too)
        for job in list(jobs):
            seqs = [(job.pages_needed(), job.pages, job.page_hashes)]
            if job.cfg_scale is not None:
                seqs.append((job.pages_needed_neg(), job.pages_neg, None))
            for need, pages, hashes in seqs:
                while need > len(pages):
                    newp = self.pagetable.extend_sequence(pages)
                    if newp is None:
                        # out of cache: finish the job to relieve pressure
                        self._finish_job(job, "cache_overflow", results)
                        if job in jobs:
                            jobs.remove(job)
                        break
                    pages.append(newp)
                    if hashes is not None:
                        hashes.append(None)
        if not jobs:
            return

        # a burst writes positions seq_len-1 .. seq_len+n-2; every row must
        # own pages for the whole window (OOB page_slots clip into page 0 —
        # never allowed to happen). Speculative extension is all-or-nothing:
        # under page pressure drop back to single-step instead of killing
        # jobs for pages they might not use.
        if n_burst > 1:
            extra = n_burst - 1
            spec: list = []
            ok = True
            for job in jobs:
                seqs = [((job.seq_len + extra + PAGE_SIZE - 1) // PAGE_SIZE,
                         job.pages, job.page_hashes)]
                if job.cfg_scale is not None:
                    seqs.append(((job.seq_len_neg + extra + PAGE_SIZE - 1)
                                 // PAGE_SIZE, job.pages_neg, None))
                for need, pages, hashes in seqs:
                    while ok and need > len(pages):
                        newp = self.pagetable.extend_sequence(pages)
                        if newp is None:
                            ok = False
                            break
                        pages.append(newp)
                        if hashes is not None:
                            hashes.append(None)
                        spec.append((pages, hashes))
            if not ok:
                for pages, hashes in reversed(spec):
                    self.pagetable.release_sequence([pages.pop()])
                    if hashes is not None:
                        hashes.pop()
                n_burst = 1

        # one row per sequence; CFG jobs contribute a negative row whose
        # logits mix into the main row's sample
        rows: list = []  # (job, is_neg)
        for job in jobs:
            rows.append((job, False))
            if job.cfg_scale is not None:
                rows.append((job, True))
        B = _bucket(len(rows), self.batch_buckets)
        mp = max(max(len(j.pages), len(j.pages_neg) or 1) for j in jobs)
        mp_bucket = _bucket(mp, self.pages_buckets)

        ids = np.zeros((B, 1), np.int32)
        pos = np.full((B, 1), mp_bucket * PAGE_SIZE, np.int32)
        bt = np.zeros((B, mp_bucket + 1), np.int32)
        slots = np.full(B, self.max_batch_size, np.int32)  # scrap row default
        seqlens = np.zeros(B, np.int32)
        pair = np.arange(B, dtype=np.int32)
        mix = np.ones(B, np.float32)
        for i, (job, is_neg) in enumerate(rows):
            last_tok = job.new_tokens[-1] if job.new_tokens else (
                job.negative_input_ids[-1] if is_neg else job.input_ids[-1])
            ids[i, 0] = last_tok
            if is_neg:
                pos[i, 0] = job.seq_len_neg - 1
                bt[i, : len(job.pages_neg)] = job.pages_neg
                seqlens[i] = job.seq_len_neg - 1
            else:
                pos[i, 0] = job.seq_len - 1
                bt[i, : len(job.pages)] = job.pages
                slots[i] = self.job_slots[job]
                seqlens[i] = job.seq_len - 1
                if job.cfg_scale is not None:
                    pair[i] = i + 1  # its negative row follows
                    mix[i] = job.cfg_scale

        row_jobs = [j for j, _ in rows]
        sp = BatchSamplerParams.from_samplers(
            [j.sampler for j in row_jobs]
            + [row_jobs[-1].sampler] * (B - len(rows))
        ).as_device()
        self.key, sub = jax.random.split(self.key)

        filter_mask = self._build_filter_mask(row_jobs, B)

        want_lp = any(j.return_top_logprobs for j in jobs)
        mrope = None
        if self.uses_mrope and any(
                getattr(j, "mrope_delta", 0) for j, _ in rows):
            deltas = np.zeros((B, 1, 1), np.int32)
            for i, (job, is_neg) in enumerate(rows):
                if not is_neg:
                    deltas[i, 0, 0] = getattr(job, "mrope_delta", 0)
            mrope = jnp.asarray(
                pos[:, :, None].astype(np.int32) + deltas)
            mrope = jnp.broadcast_to(mrope, (B, 1, 3))
        adaptive = [(i, st) for i, (j, neg) in enumerate(rows) if not neg
                    for st in j.sampler.steps
                    if isinstance(st, SS_AdaptiveP) and st.target < 1.0]

        if n_burst > 1 and filter_mask is None:
            # multi-step scan: tokens feed back device-side; CFG negative
            # rows feed from their positive row's sample
            feed = np.arange(B, dtype=np.int32)
            for i, (job, is_neg) in enumerate(rows):
                if not is_neg and job.cfg_scale is not None:
                    feed[i + 1] = i  # the negative row follows the sample
            step = self._get_burst_fn(logprobs=want_lp)
            outs, self.cache.state, self.token_counts = step(
                self.model.params, jnp.asarray(ids), self.cache.state,
                jnp.asarray(pos), jnp.asarray(seqlens), jnp.asarray(bt),
                sp, self.token_counts, jnp.asarray(slots), sub,
                jnp.asarray(feed), jnp.asarray(pair), jnp.asarray(mix),
                mrope, n_steps=n_burst,
            )
            if want_lp:
                toks_all, tokp_all, lpv_all, lpi_all = outs
                lpv_all, lpi_all = np.asarray(lpv_all), np.asarray(lpi_all)
            else:
                toks_all, tokp_all = outs
                lpv_all = lpi_all = None
            toks_all = np.asarray(toks_all)                    # (n, B)
            if self.mh_broadcast:
                from ..parallel.multihost import broadcast_from_host0

                toks_all = np.asarray(broadcast_from_host0(toks_all))
            tokp_np = np.asarray(tokp_all) if adaptive else None
            dis_slots: list = []
            dis_toks: list = []
            for s in range(n_burst):
                for i, (job, is_neg) in enumerate(rows):
                    if is_neg:
                        continue
                    tok = int(toks_all[s, i])
                    if job.status != "running":
                        # finished at an earlier burst step: the device kept
                        # stepping this row — reverse its penalty counts
                        dis_slots.append(int(slots[i]))
                        dis_toks.append(tok)
                        continue
                    if tokp_np is not None:
                        for ii, st in adaptive:
                            if ii == i:
                                st.update(float(tokp_np[s, i]))
                    lp = None
                    if lpv_all is not None and job.return_top_logprobs:
                        k = min(job.return_top_logprobs, lpv_all.shape[2])
                        lp = {int(lpi_all[s, i, j]): float(lpv_all[s, i, j])
                              for j in range(k)}
                    self._receive_token(job, tok, results, top_logprobs=lp)
            if dis_slots:
                self.token_counts = self.token_counts.at[
                    jnp.asarray(dis_slots), jnp.asarray(dis_toks)].add(-1)
            return

        step = self._get_decode_fn(logprobs=want_lp)
        out = step(
            self.model.params, jnp.asarray(ids), self.cache.state,
            jnp.asarray(pos), jnp.asarray(seqlens), jnp.asarray(bt),
            sp, self.token_counts, jnp.asarray(slots), sub, filter_mask,
            jnp.asarray(pair), jnp.asarray(mix), mrope,
        )
        if want_lp:
            toks, tok_p, self.cache.state, self.token_counts, lp_vals, lp_ids = out
            lp_vals, lp_ids = np.asarray(lp_vals), np.asarray(lp_ids)
        else:
            toks, tok_p, self.cache.state, self.token_counts = out
            lp_vals = lp_ids = None
        toks = np.asarray(toks)
        if self.mh_broadcast:
            from ..parallel.multihost import broadcast_from_host0

            toks = np.asarray(broadcast_from_host0(toks))
        # adaptive-p feedback: the sampled probability adapts next step's
        # per-row target (reference SS_AdaptiveP running decayed average)
        if adaptive:
            tp = np.asarray(tok_p)
            for i, st in adaptive:
                st.update(float(tp[i]))

        for i, (job, is_neg) in enumerate(rows):
            if is_neg:
                continue
            lp = None
            if lp_vals is not None and job.return_top_logprobs:
                k = min(job.return_top_logprobs, lp_vals.shape[1])
                lp = {int(lp_ids[i, j]): float(lp_vals[i, j]) for j in range(k)}
            self._receive_token(job, int(toks[i]), results, top_logprobs=lp)

    def _build_filter_mask(self, jobs: list, B: int):
        """Additive logits mask: constrained-decoding filters, token-healing
        prefix restriction, and banned-string positional bans."""
        V = self.model.config.vocab_size
        fm = None
        NEG = np.float32(-1e30)

        def row(i):
            nonlocal fm
            if fm is None:
                fm = np.zeros((B, V), dtype=np.float32)
            return fm, i

        from .sampler import SS_LogitBias, SS_BanTokens

        for i, job in enumerate(jobs):
            for f in job.filters:
                m = f.allowed_mask(V)
                if m is not None:
                    row(i)
                    fm[i] += m
            for step in job.sampler.steps:
                if isinstance(step, SS_LogitBias) and step.bias:
                    row(i)
                    for tid, b in step.bias:
                        fm[i, tid] += b
                elif isinstance(step, SS_BanTokens) and step.tokens:
                    row(i)
                    fm[i, list(step.tokens)] = NEG
            if job.healing_prefix and not job.new_tokens:
                allowed = self.tokenizer.prefix_token_ids(job.healing_prefix)
                row(i)
                mask = np.full(V, NEG, dtype=np.float32)
                mask[list(allowed) or [0]] = 0.0
                fm[i] += mask
            bans = job.pos_bans.get(len(job.new_tokens))
            if bans:
                row(i)
                for t in bans:
                    fm[i, t] = NEG
        return None if fm is None else jnp.asarray(fm)

    # -- token handling ---------------------------------------------------------------

    def _receive_token(self, job: Job, tok: int, results: list,
                       top_logprobs: dict | None = None):
        if not job.new_tokens:
            job.time_first_token = time.time()
        job.time_last_token = time.time()
        job.new_tokens.append(tok)
        job._stream_logprobs = top_logprobs
        self._maybe_finalize_decode_page(job)

        stops = [f.feed(tok) for f in job.filters]
        if any(stops):
            self._emit_text(job, results, flush=True)
            self._finish_job(job, "end_filter", results)
            return
        # next step's masks evaluate on the worker pool while the host
        # finishes streaming/scheduling (reference filter.py background eval)
        for f in job.filters:
            f.prefetch_mask(self.model.config.vocab_size)

        if tok in job.stop_tokens:
            job.new_tokens.pop()  # stop token not part of the output
            self._finish_job(job, "stop_token", results)
            return
        if job.loop_detector is not None and job.loop_detector.feed(tok):
            self._emit_text(job, results, flush=True)
            self._finish_job(job, "loop_detected", results)
            return
        if len(job.new_tokens) >= job.max_new_tokens:
            self._emit_text(job, results, flush=True)
            self._finish_job(job, "max_new_tokens", results)
            return
        self._emit_text(job, results)

    def _rewind_banned(self, job: Job, match_idx: int) -> None:
        """Drop generated tokens so the decoded text ends before a banned-
        string match; ban the first offending token at that position so the
        resample takes a different branch (reference job.py banned strings).
        Paged KV needs no explicit rewind: writes are position-keyed and
        slots past the shortened length are masked until overwritten."""
        keep_chars = len(job.emitted_text) + match_idx
        dropped: list[int] = []
        while job.new_tokens and len(
                self.tokenizer.decode(job.new_tokens)) > keep_chars:
            dropped.append(job.new_tokens.pop())
        if not dropped:
            return
        for f in job.filters:
            f.rollback(len(dropped))
        job.pos_bans.setdefault(len(job.new_tokens), set()).add(dropped[-1])
        slot = self.job_slots.get(job)
        if slot is not None:
            for t in dropped:
                self.token_counts = self.token_counts.at[slot, t].add(-1)
        if job.loop_detector is not None:
            job.loop_detector.rollback(len(dropped))
        full = self.tokenizer.decode(job.new_tokens) if job.new_tokens else ""
        job.held_text = full[len(job.emitted_text):]

    def _maybe_finalize_decode_page(self, job: Job):
        n = job.seq_len
        if n % PAGE_SIZE == 0:
            pi = n // PAGE_SIZE - 1
            prev = job.page_hashes[pi - 1] if pi > 0 else None
            if prev is not None or pi == 0:
                ids = job.all_ids()
                h = _page_hash(prev, ids[pi * PAGE_SIZE : (pi + 1) * PAGE_SIZE])
                job.page_hashes[pi] = h
                self.pagetable.finalize_page(
                    job.pages[pi], prev, ids[pi * PAGE_SIZE : (pi + 1) * PAGE_SIZE]
                )

    def _emit_text(self, job: Job, results: list, flush: bool = False):
        if self.tokenizer is None:
            ev = {
                "identifier": job.identifier, "stage": "streaming", "job": job,
                "token_ids": [job.new_tokens[-1]],
            }
            if getattr(job, "_stream_logprobs", None):
                ev["top_logprobs"] = job._stream_logprobs
            results.append(ev)
            return
        full = self.tokenizer.decode(job.new_tokens)
        new = full[len(job.emitted_text) + len(job.held_text):]
        pending = job.held_text + new
        hold = 0
        if not flush and job.banned_strings:
            for bs in job.banned_strings:
                bidx = pending.find(bs)
                if bidx >= 0:
                    self._rewind_banned(job, bidx)
                    return
                # hold back a suffix that could grow into the banned string
                for hl in range(min(len(bs) - 1, len(pending)), 0, -1):
                    if bs.startswith(pending[-hl:]):
                        hold = max(hold, hl)
                        break
        if not flush:
            # hold back any suffix that could grow into a stop string
            for ss in job.stop_strings:
                idx = pending.find(ss)
                if idx >= 0:
                    emit = pending[:idx]
                    job.emitted_text += emit
                    job.held_text = ""
                    if emit:
                        results.append({
                            "identifier": job.identifier, "stage": "streaming",
                            "job": job, "text": emit,
                        })
                    self._finish_job(job, "stop_string", results)
                    return
                for hl in range(min(len(ss) - 1, len(pending)), 0, -1):
                    if ss.startswith(pending[-hl:]):
                        hold = max(hold, hl)
                        break
        emit = pending[: len(pending) - hold] if hold else pending
        job.held_text = pending[len(pending) - hold:] if hold else ""
        if emit:
            job.emitted_text += emit
            ev = {
                "identifier": job.identifier, "stage": "streaming", "job": job,
                "text": emit,
            }
            if getattr(job, "_stream_logprobs", None):
                ev["top_logprobs"] = job._stream_logprobs
            results.append(ev)

    def _finish_job(self, job: Job, reason: str, results: list | None = None):
        job.status = "finished"
        job.eos_reason = reason
        if job in self.active:
            self.active.remove(job)
        self.pagetable.release_sequence(job.pages)
        if job.pages_neg:
            self.pagetable.release_sequence(job.pages_neg)
            job.pages_neg = []
        slot = self.job_slots.pop(job, None)
        if slot is not None:
            self.free_slots.append(slot)
        if results is not None:
            if job.held_text:
                results.append({
                    "identifier": job.identifier, "stage": "streaming", "job": job,
                    "text": job.held_text,
                })
                job.emitted_text += job.held_text
                job.held_text = ""
            results.append({
                "identifier": job.identifier, "stage": "finished", "job": job,
                "eos_reason": reason, "new_tokens": list(job.new_tokens),
                "full_text": job.emitted_text,
                **job.metrics(),
            })

    # -- defragmentation ----------------------------------------------------------

    def defrag(self) -> bool:
        """Compact live/hashed pages to the front of the cache arrays
        (reference generator.py:444 defrag on queue drain). Updates the page
        table, active jobs' page lists, and permutes the device tensors."""
        order = self.pagetable.plan_defrag()
        if order is None:
            return False
        remap = self.pagetable.apply_defrag(order)
        for job in self.active:
            job.pages = [remap[p] for p in job.pages]
        perm = jnp.asarray(np.asarray(order, dtype=np.int32))
        num_pages = self.pagetable.num_pages
        for key in self.cache.layer_keys:
            layer = self.cache.state[key]
            self.cache.state[key] = {
                name: (arr[perm] if arr.shape[0] == num_pages
                       and name[0] in "kv" else arr)
                for name, arr in layer.items()
            }
        return True

    # -- speculative decoding ---------------------------------------------------

    def _draft_tokens(self, job: Job, k: int) -> list:
        """Propose up to k draft tokens for the job."""
        if self.use_ngram_draft:
            if not hasattr(job, "sam") or job.sam is None:
                from ..native.wrappers import make_sam

                job.sam = make_sam()
                for t in job.all_ids().tolist():
                    job.sam.extend(int(t))
                job.sam_fed = job.seq_len
            while job.sam_fed < job.seq_len:
                ids = job.all_ids()
                job.sam.extend(int(ids[job.sam_fed]))
                job.sam_fed += 1
            d = job.sam.draft(k)
            if d:
                return d
        if self.draft_model is not None:
            return self._draft_with_model(job, k)
        return []

    def _draft_with_model(self, job: Job, k: int) -> list:
        """Greedy-decode k tokens from the draft model (own linear cache,
        positions-keyed so rejections need no explicit rewind)."""
        import jax.numpy as jnp
        from ..model.cache import Cache as _Cache, CacheSpec as _Spec

        if self.draft_cache is None:
            self.draft_cache = _Cache(
                self.draft_model,
                _Spec(layout="linear", batch_size=self.max_batch_size,
                      max_len=self.cache.spec.num_pages * PAGE_SIZE // 4),
            )
            self._draft_done = {}
        slot = self.job_slots[job]
        done = self._draft_done.get(job.identifier, 0)
        step = self.draft_model.jitted_step("dense", donate_cache=False)
        ids = job.all_ids()
        # catch up the draft cache on tokens not yet ingested (all but last)
        while done < job.seq_len - 1:
            chunk = min(128, job.seq_len - 1 - done)
            cids = np.zeros((self.max_batch_size, chunk), np.int32)
            cids[slot] = ids[done : done + chunk]
            pos = np.zeros((self.max_batch_size, chunk), np.int32)
            pos[slot] = np.arange(done, done + chunk)
            _, self.draft_cache.state = step(
                self.draft_model.params, jnp.asarray(cids), self.draft_cache.state,
                jnp.asarray(pos), jnp.full(self.max_batch_size, done, np.int32),
                None)
            done += chunk
        # k greedy draft steps scan device-side (argmax feeds back), so
        # drafting costs ONE dispatch instead of k round-trips
        dkey = ("draft_scan",)
        if dkey not in self._decode_fns:
            model_step = self.draft_model.step_fn("dense")
            B = self.max_batch_size

            def dscan(params, tok, state, t0, slot, k):
                def body(carry, _):
                    tok, state, t = carry
                    cids = jnp.zeros((B, 1), jnp.int32).at[slot, 0].set(tok)
                    pos = jnp.zeros((B, 1), jnp.int32).at[slot, 0].set(t)
                    logits, state = model_step(
                        params, cids, state, pos,
                        jnp.full((B,), 0, jnp.int32).at[slot].set(t), None)
                    nxt = jnp.argmax(logits[slot, -1]).astype(jnp.int32)
                    return (nxt, state, t + 1), nxt

                (_, state, _), toks = jax.lax.scan(
                    body, (tok, state, t0), None, length=k)
                return toks, state

            self._decode_fns[dkey] = jax.jit(
                dscan, static_argnames=("k",), donate_argnums=(2,))
        toks, self.draft_cache.state = self._decode_fns[dkey](
            self.draft_model.params, jnp.int32(ids[-1]),
            self.draft_cache.state, jnp.int32(job.seq_len - 1),
            jnp.int32(slot), k=k)
        drafts = [int(x) for x in np.asarray(toks)]
        self._draft_done[job.identifier] = job.seq_len - 1
        return drafts

    def _decode_batch_mtp(self, jobs: list, results: list):
        """Greedy speculative decode with the MTP head as the drafter
        (reference generator.py:568). One verify forward per iteration
        returns logits AND hiddens; accepted (token, hidden) pairs sync the
        MTP cache next iteration before chain-drafting."""
        k = self.num_draft_tokens
        for job in list(jobs):
            need = (job.seq_len + k + 1 + PAGE_SIZE - 1) // PAGE_SIZE
            while len(job.pages) < need:
                newp = self.pagetable.extend_sequence(job.pages)
                if newp is None:
                    self._finish_job(job, "cache_overflow", results)
                    jobs.remove(job)
                    break
                job.pages.append(newp)
                job.page_hashes.append(None)
        if not jobs:
            return

        drafts = [self._mtp_drafts(j, k) for j in jobs]
        self.num_drafted += sum(len(d) for d in drafts)

        B = _bucket(len(jobs), self.batch_buckets)
        mp = max(len(j.pages) for j in jobs)
        mp_bucket = _bucket(mp, self.pages_buckets)
        S = k + 1

        ids = np.zeros((B, S), np.int32)
        pos = np.full((B, S), mp_bucket * PAGE_SIZE, np.int32)
        bt = np.zeros((B, mp_bucket + 1), np.int32)
        for i, job in enumerate(jobs):
            last = job.new_tokens[-1] if job.new_tokens else job.input_ids[-1]
            row = [int(last)] + list(drafts[i]) + [0] * (k - len(drafts[i]))
            ids[i] = row[:S]
            pos[i] = np.arange(job.seq_len - 1, job.seq_len - 1 + S)
            bt[i, : len(job.pages)] = job.pages

        seqlens = np.zeros(B, np.int32)
        slots = np.full(B, self.max_batch_size, np.int32)
        for i, job in enumerate(jobs):
            seqlens[i] = job.seq_len - 1
            slots[i] = self.job_slots[job]
        step = self._get_prefill_fn(hidden=True, history=self.has_recurrent)
        vout = step(
            self.model.params, jnp.asarray(ids), self.cache.state,
            jnp.asarray(pos), jnp.asarray(seqlens), jnp.asarray(bt),
            jnp.asarray(slots) if self.has_recurrent else None,
        )
        if self.has_recurrent:
            logits, hiddens, self.cache.state, rec_hist = vout
        else:
            logits, hiddens, self.cache.state = vout
            rec_hist = None
        out = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int64)
        hiddens = np.asarray(hiddens, dtype=np.float32)

        for i, job in enumerate(jobs):
            d = drafts[i]
            T = job.seq_len
            accepted = 0
            for j in range(len(d)):
                if out[i, j] == d[j]:
                    accepted += 1
                else:
                    break
            self.num_accepted += accepted
            job.accepted_draft_tokens += accepted
            job.rejected_draft_tokens += len(d) - accepted
            if rec_hist is not None:
                self._rewind_recurrent(job, i, accepted, rec_hist)
            new = [int(out[i, j]) for j in range(accepted + 1)]
            # next iteration's MTP sync: token a_j at position T-1+j paired
            # with the hidden computed there (valid through the accepted run)
            job.mtp_pend = (
                np.asarray(new, dtype=np.int64),
                hiddens[i, : accepted + 1].copy(),
                np.arange(T - 1, T + accepted),
            )
            for tok in new:
                if job.status != "running":
                    break
                n_before = len(job.new_tokens)
                self._receive_token(job, tok, results)
                if len(job.new_tokens) <= n_before:
                    # a banned-string rewind fired inside _receive_token:
                    # the remaining verified tokens were computed from the
                    # pre-rewind context — resample at the rewound position
                    break

    def _decode_batch_sd(self, jobs: list, results: list):
        """Greedy speculative decode: verify drafts with one (B, k+1) forward.
        Output-identical to plain greedy decode."""
        k = self.num_draft_tokens
        # page growth must cover seq_len + k + 1 positions
        for job in list(jobs):
            need = (job.seq_len + k + 1 + PAGE_SIZE - 1) // PAGE_SIZE
            while len(job.pages) < need:
                newp = self.pagetable.extend_sequence(job.pages)
                if newp is None:
                    self._finish_job(job, "cache_overflow", results)
                    jobs.remove(job)
                    break
                job.pages.append(newp)
                job.page_hashes.append(None)
        if not jobs:
            return

        drafts = [self._draft_tokens(j, k) for j in jobs]
        self.num_drafted += sum(len(d) for d in drafts)

        B = _bucket(len(jobs), self.batch_buckets)
        mp = max(len(j.pages) for j in jobs)
        mp_bucket = _bucket(mp, self.pages_buckets)
        S = k + 1

        ids = np.zeros((B, S), np.int32)
        pos = np.full((B, S), mp_bucket * PAGE_SIZE, np.int32)
        bt = np.zeros((B, mp_bucket + 1), np.int32)
        seqlens = np.zeros(B, np.int32)
        slots = np.full(B, self.max_batch_size, np.int32)
        for i, job in enumerate(jobs):
            last = job.new_tokens[-1] if job.new_tokens else job.input_ids[-1]
            row = [int(last)] + list(drafts[i]) + [0] * (k - len(drafts[i]))
            ids[i] = row[:S]
            pos[i] = np.arange(job.seq_len - 1, job.seq_len - 1 + S)
            bt[i, : len(job.pages)] = job.pages
            seqlens[i] = job.seq_len - 1
            slots[i] = self.job_slots[job]

        step = self._get_prefill_fn(history=self.has_recurrent)
        out = step(
            self.model.params, jnp.asarray(ids), self.cache.state,
            jnp.asarray(pos), jnp.asarray(seqlens), jnp.asarray(bt),
            jnp.asarray(slots) if self.has_recurrent else None,
        )
        if self.has_recurrent:
            logits, self.cache.state, rec_hist = out
        else:
            logits, self.cache.state = out
            rec_hist = None
        out = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int64)  # (B, S)
        filtered_rows = {i for i, j in enumerate(jobs) if j.filters}
        logits_np = (np.asarray(logits) if filtered_rows else None)

        for i, job in enumerate(jobs):
            d = drafts[i]
            if i in filtered_rows:
                # constrained verify: the mask at position j depends on the
                # filter state after position j-1, so accept sequentially —
                # filters are only ever fed ACCEPTED tokens (the journaled
                # rollback contract covers banned-string rewinds)
                V = logits_np.shape[-1]
                accepted = 0
                j = 0
                while job.status == "running" and j <= len(d):
                    lg = logits_np[i, j].copy()
                    for f in job.filters:
                        m = f.allowed_mask(V)
                        if m is not None:
                            lg = lg + m
                    tok = int(np.argmax(lg))
                    match = j < len(d) and tok == d[j]
                    n_before = len(job.new_tokens)
                    self._receive_token(job, tok, results)
                    if len(job.new_tokens) <= n_before:
                        break  # banned-string rewind: stop the verify run
                    if match:
                        accepted += 1
                        j += 1
                    else:
                        break
                self.num_accepted += accepted
                job.accepted_draft_tokens += accepted
                job.rejected_draft_tokens += len(d) - accepted
                if rec_hist is not None:
                    self._rewind_recurrent(job, i, accepted, rec_hist)
                continue
            accepted = 0
            for j in range(len(d)):
                if out[i, j] == d[j]:
                    accepted += 1
                else:
                    break
            self.num_accepted += accepted
            job.accepted_draft_tokens += accepted
            job.rejected_draft_tokens += len(d) - accepted
            if rec_hist is not None:
                self._rewind_recurrent(job, i, accepted, rec_hist)
            # accepted draft tokens + one bonus token, in order
            new = [int(out[i, j]) for j in range(accepted + 1)]
            for tok in new:
                if job.status != "running":
                    break
                n_before = len(job.new_tokens)
                self._receive_token(job, tok, results)
                if len(job.new_tokens) <= n_before:
                    # a banned-string rewind fired inside _receive_token:
                    # the remaining verified tokens were computed from the
                    # pre-rewind context — resample at the rewound position
                    break

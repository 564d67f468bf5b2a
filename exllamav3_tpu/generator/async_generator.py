"""Asyncio wrapper around Generator.

Feature reference: /root/reference/exllamav3/generator/async_generator.py
(AsyncGenerator:10, AsyncJob:112). A background task drives iterate();
AsyncJob exposes per-job results as an async iterator.
"""
from __future__ import annotations

import asyncio

from .generator import Generator
from .job import Job


class AsyncGenerator:
    def __init__(self, generator: Generator):
        self.generator = generator
        self.jobs: dict = {}
        self._task: asyncio.Task | None = None
        self._stop = False

    async def _loop(self):
        while not self._stop:
            if not self.generator.num_remaining_jobs():
                await asyncio.sleep(0.005)
                continue
            results = await asyncio.to_thread(self.generator.iterate)
            for r in results:
                aj = self.jobs.get(r["identifier"])
                if aj is not None:
                    aj.queue.put_nowait(r)
                    if r["stage"] == "finished":
                        del self.jobs[r["identifier"]]

    def _ensure_task(self):
        if self._task is None or self._task.done():
            self._stop = False
            self._task = asyncio.get_event_loop().create_task(self._loop())

    def enqueue(self, job: Job) -> "AsyncJob":
        aj = AsyncJob(self, job)
        self.jobs[job.identifier] = aj
        self.generator.enqueue(job)
        self._ensure_task()
        return aj

    async def close(self):
        self._stop = True
        if self._task is not None:
            try:
                await self._task
            except asyncio.CancelledError:
                pass


class AsyncJob:
    def __init__(self, agen: AsyncGenerator, job: Job):
        self.agen = agen
        self.job = job
        self.queue: asyncio.Queue = asyncio.Queue()

    def __aiter__(self):
        return self

    async def __anext__(self):
        while True:
            r = await self.queue.get()
            if r["stage"] == "finished":
                self._finished = True
                return r
            if r["stage"] in ("streaming",):
                return r

    async def collect(self) -> dict:
        """Drain until finished; returns the final result with full_text."""
        async for r in self:
            if r["stage"] == "finished":
                return r

    async def cancel(self):
        self.agen.generator.cancel(self.job)

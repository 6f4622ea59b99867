"""ctypes bindings to the native runtime core (csrc/fa_runtime.cc).

Auto-builds ``libfa_runtime.so`` with make/g++ on first use; falls back to a
behavior-identical pure-Python implementation when no toolchain is available
(CI portability), so callers never branch.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from collections import deque

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")
_SO = os.path.join(_CSRC, "libfa_runtime.so")

_lib = None
_build_attempted = False


def _load():
    global _lib, _build_attempted
    if _lib is not None or _build_attempted:
        return _lib
    _build_attempted = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-s"], cwd=_CSRC, check=True, capture_output=True
            )
        except (OSError, subprocess.CalledProcessError):
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.fa_alloc_create.restype = ctypes.c_void_p
    lib.fa_alloc_create.argtypes = [ctypes.c_int32]
    lib.fa_alloc_destroy.argtypes = [ctypes.c_void_p]
    lib.fa_alloc_num_free.restype = ctypes.c_int32
    lib.fa_alloc_num_free.argtypes = [ctypes.c_void_p]
    lib.fa_alloc_pages.restype = ctypes.c_int32
    lib.fa_alloc_pages.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.fa_alloc_free_pages.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.fa_sched_create.restype = ctypes.c_void_p
    lib.fa_sched_create.argtypes = [ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
    lib.fa_sched_destroy.argtypes = [ctypes.c_void_p]
    lib.fa_sched_add_request.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.fa_sched_num_waiting.restype = ctypes.c_int32
    lib.fa_sched_num_waiting.argtypes = [ctypes.c_void_p]
    lib.fa_sched_num_running.restype = ctypes.c_int32
    lib.fa_sched_num_running.argtypes = [ctypes.c_void_p]
    lib.fa_sched_admit.restype = ctypes.c_int32
    lib.fa_sched_admit.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
    ]
    lib.fa_sched_finish.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.fa_sched_cancel.restype = ctypes.c_int32
    lib.fa_sched_cancel.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    _lib = lib
    return _lib


class PageAllocator:
    """Free-list page allocator (native-backed when available)."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        lib = _load()
        self._lib = lib
        if lib is not None:
            self._h = lib.fa_alloc_create(num_pages)
            self._free = None
        else:
            self._h = None
            self._free = list(range(num_pages - 1, -1, -1))

    @property
    def native(self) -> bool:
        return self._h is not None

    def num_free(self) -> int:
        if self._h is not None:
            return self._lib.fa_alloc_num_free(self._h)
        return len(self._free)

    def alloc(self, n: int) -> list[int] | None:
        """Allocate n pages; None if insufficient (no partial allocation)."""
        if n == 0:
            return []
        if self._h is not None:
            out = (ctypes.c_int32 * n)()
            if self._lib.fa_alloc_pages(self._h, n, out) != 0:
                return None
            return list(out)
        if len(self._free) < n:
            return None
        pages, self._free = self._free[-n:][::-1], self._free[:-n]
        return pages

    def free(self, pages: list[int]) -> None:
        if not pages:
            return
        if self._h is not None:
            arr = (ctypes.c_int32 * len(pages))(*pages)
            self._lib.fa_alloc_free_pages(self._h, arr, len(pages))
        else:
            self._free.extend(pages)

    def __del__(self):
        if getattr(self, "_h", None) is not None and self._lib is not None:
            self._lib.fa_alloc_destroy(self._h)
            self._h = None


class Scheduler:
    """FCFS continuous-batching admission scheduler (native-backed)."""

    def __init__(self, max_batch: int, page_size: int, *, reserve_worst_case: bool = False):
        self.max_batch = max_batch
        self.page_size = page_size
        self.reserve_worst_case = reserve_worst_case
        lib = _load()
        self._lib = lib
        if lib is not None:
            self._h = lib.fa_sched_create(
                max_batch, page_size, int(reserve_worst_case)
            )
            self._waiting = None
            self._running = None
        else:
            self._h = None
            self._waiting = deque()
            self._running = {}

    @property
    def native(self) -> bool:
        return self._h is not None

    def add_request(self, req_id: int, prompt_len: int, max_new_tokens: int) -> None:
        if self._h is not None:
            self._lib.fa_sched_add_request(self._h, req_id, prompt_len, max_new_tokens)
        else:
            self._waiting.append((req_id, prompt_len, max_new_tokens))

    def num_waiting(self) -> int:
        if self._h is not None:
            return self._lib.fa_sched_num_waiting(self._h)
        return len(self._waiting)

    def num_running(self) -> int:
        if self._h is not None:
            return self._lib.fa_sched_num_running(self._h)
        return len(self._running)

    def admit(self, free_pages: int, max_out: int | None = None) -> list[int]:
        """FCFS-admit waiting requests that fit the page budget + batch."""
        max_out = self.max_batch if max_out is None else max_out
        if self._h is not None:
            out = (ctypes.c_int64 * max_out)()
            n = self._lib.fa_sched_admit(self._h, free_pages, out, max_out)
            return list(out[:n])
        admitted = []
        budget = free_pages
        if self.reserve_worst_case:
            # Reservations must survive across admit() calls: subtract the
            # decode headroom (worst-case span minus the prompt pages the
            # caller has already allocated) of every running request, else a
            # later admit() hands their reserved pages to a new request.
            for prompt_len, max_new in self._running.values():
                span_pages = -(-(prompt_len + max_new) // self.page_size)
                prompt_pages = -(-prompt_len // self.page_size)
                budget -= span_pages - prompt_pages
        while (
            self._waiting
            and len(admitted) < max_out
            and len(self._running) < self.max_batch
        ):
            req_id, prompt_len, max_new = self._waiting[0]
            span = prompt_len + max_new if self.reserve_worst_case else prompt_len
            need = -(-span // self.page_size)
            if need > budget:
                break
            budget -= need
            admitted.append(req_id)
            self._running[req_id] = (prompt_len, max_new)
            self._waiting.popleft()
        return admitted

    def finish(self, req_id: int) -> None:
        if self._h is not None:
            self._lib.fa_sched_finish(self._h, req_id)
        else:
            self._running.pop(req_id, None)

    def cancel(self, req_id: int) -> bool:
        """Drop a request wherever it sits (waiting or running); True if
        found.  Page cleanup for running requests is the caller's job."""
        if self._h is not None:
            return bool(self._lib.fa_sched_cancel(self._h, req_id))
        if req_id in self._running:
            del self._running[req_id]
            return True
        for i, (rid, *_rest) in enumerate(self._waiting):
            if rid == req_id:
                del self._waiting[i]
                return True
        return False

    def __del__(self):
        if getattr(self, "_h", None) is not None and self._lib is not None:
            self._lib.fa_sched_destroy(self._h)
            self._h = None

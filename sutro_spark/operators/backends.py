"""Inference backends for the ``llm_transform`` operator.

The reference ships prompts over HTTPS to api.sutro.sh
(/root/reference/sutro/sdk.py:216-254) and the server returns outputs
positionally aligned. Here a backend is an executor-side callable invoked
from inside ``mapInPandas`` with an Arrow batch of prompts.

Backends must be:

- **picklable by name** — executors resolve backends from a module-level
  registry so no live session objects are captured in closures;
- **idempotent** — Spark task retries mean a batch may run twice
  (reference analog: submissions are never retried, sdk.py:247-252;
  our answer is determinism keyed on the prompt itself);
- **vectorized** — one call per Arrow batch, pandas in / pandas out.

``StubBackend`` is the default: a deterministic pure function of the
prompt, designed so that every template pipeline (generate / extract /
classify / score / rank / embed) is *expressible in ANSI SQL* and hence
checkable against the DuckDB oracle (SURVEY.md §5).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Protocol

import numpy as np
import pandas as pd


class Backend(Protocol):
    def generate(
        self,
        prompts: pd.Series,
        *,
        model: str,
        system_prompt: str = "",
        output_schema: dict | None = None,
        sampling_params: dict | None = None,
        random_seed_per_input: bool = False,
    ) -> pd.DataFrame: ...

    def embed(self, prompts: pd.Series, *, model: str, dim: int = 64) -> pd.Series: ...


@dataclass
class StubBackend:
    """Deterministic stand-in for the remote inference service.

    Output rules (all pure functions of the prompt string — the SQL
    equivalent is noted so oracle queries can mirror them exactly):

    - plain generation: ``'ECHO: ' + upper(prompt[:32])``
      (SQL: ``'ECHO: ' || upper(substr(prompt, 1, 32))``)
    - structured output (JSON schema with properties, in declaration
      order, idx = 0-based property index):
        * string:  ``upper(prompt[idx : idx+12])``
          (SQL: ``upper(substr(prompt, idx+1, 12))``)
        * string with enum E: ``E[len(prompt) % |E|]``
        * integer with minimum/maximum: ``min + (len(prompt)+idx) % span``
        * number: ``((len(prompt)+idx) % 1000) / 8.0`` (exact in binary fp)
        * boolean: ``(len(prompt)+idx) % 2 == 0``
        * array of enum strings: the enum rotated left by
          ``len(prompt) % |E|``
    - cumulative_logprobs: ``-len(prompt) / 100.0`` (exact in binary fp)
    - embeddings: ``v[i] = ((len(prompt)*31 + i*17) % 97) / 97.0``

    len() counts characters, matching SQL ``length()`` on UTF-8 text.
    """

    name: str = "stub"

    def generate(
        self,
        prompts: pd.Series,
        *,
        model: str = "stub-echo",
        system_prompt: str = "",
        output_schema: dict | None = None,
        sampling_params: dict | None = None,
        random_seed_per_input: bool = False,
    ) -> pd.DataFrame:
        if output_schema is None:
            outputs = "ECHO: " + prompts.fillna("").str.slice(0, 32).str.upper()
            if random_seed_per_input:
                # reference knob (sdk.py:478): vary sampling per row.
                # Deterministic analog: suffix a per-prompt seed so the
                # effect is observable yet reproducible/idempotent.
                seeds = prompts.fillna("").map(
                    lambda p: f" [seed={sum(p.encode()) % 997}]"
                )
                outputs = outputs + seeds
        else:
            outputs = prompts.fillna("").map(lambda p: self._structured(p, output_schema))
        logprobs = -prompts.fillna("").str.len().astype("float64") / 100.0
        # Null prompt → null output (matches P3's null-propagation contract:
        # a null option value nulls the whole row, evals.py:130-139).
        mask = prompts.isna()
        if mask.any():
            outputs = outputs.where(~mask, None)
            logprobs = logprobs.where(~mask, None)
        return pd.DataFrame({"outputs": outputs, "cumulative_logprobs": logprobs})

    @staticmethod
    def _structured(prompt: str, schema: dict) -> str:
        props = schema.get("properties", {})
        out: dict = {}
        n = len(prompt)
        for idx, (name, spec) in enumerate(props.items()):
            typ = spec.get("type")
            enum = spec.get("enum")
            if typ == "string" and enum:
                out[name] = enum[n % len(enum)]
            elif typ == "string":
                out[name] = prompt[idx : idx + 12].upper()
            elif typ == "integer":
                lo = int(spec.get("minimum", 0))
                hi = int(spec.get("maximum", lo + 999))
                out[name] = lo + (n + idx) % (hi - lo + 1)
            elif typ == "number":
                out[name] = ((n + idx) % 1000) / 8.0
            elif typ == "boolean":
                out[name] = (n + idx) % 2 == 0
            elif typ == "array":
                items = spec.get("items", {})
                opts = items.get("enum") or []
                k = n % len(opts) if opts else 0
                out[name] = list(opts[k:]) + list(opts[:k])
            else:
                out[name] = prompt[idx : idx + 12].upper()
        return json.dumps(out, ensure_ascii=False)

    def embed(self, prompts: pd.Series, *, model: str = "stub-embed", dim: int = 8) -> pd.Series:
        lens = prompts.fillna("").str.len().to_numpy(dtype=np.int64)
        i = np.arange(dim, dtype=np.int64)
        mat = ((lens[:, None] * 31 + i[None, :] * 17) % 97) / 97.0
        vecs = pd.Series(list(mat), index=prompts.index)
        mask = prompts.isna()
        if mask.any():
            vecs = vecs.where(~mask, None)
        return vecs


class RetryableError(Exception):
    """Transient failure (the reference's 524-timeout class, sdk.py:109)."""


@dataclass
class RetryPolicy:
    """Reference retry semantics (/root/reference/sutro/sdk.py:103-177,
    407-425):

    - idempotent requests: <= ``max_retries`` retries with exponential
      1, 2, 4, ... second backoff on transient errors;
    - non-idempotent submissions: NEVER retried (an ambiguous timeout
      could have created the job — duplicate risk, sdk.py:247-252);
    - results fetch: bounded linear retry (<= 20 x 5 s) for the
      results-write race, via ``fetch_retries``/``fetch_interval``.

    ``sleep`` is injectable for tests.
    """

    max_retries: int = 5
    fetch_retries: int = 20
    fetch_interval: float = 5.0
    sleep: object = None

    def _sleep(self, seconds: float) -> None:
        import time as _time

        (self.sleep or _time.sleep)(seconds)

    def call(self, fn, *, idempotent: bool):
        """Run ``fn`` under the retry budget. Non-idempotent calls get
        exactly one attempt; transient errors propagate."""
        attempts = self.max_retries + 1 if idempotent else 1
        delay = 1.0
        last: Exception | None = None
        for attempt in range(attempts):
            try:
                return fn()
            except RetryableError as e:
                last = e
                if attempt == attempts - 1:
                    break
                self._sleep(delay)
                delay *= 2.0
        raise last  # type: ignore[misc]

    def fetch(self, fn):
        """Bounded linear retry for eventually-consistent reads."""
        last: Exception | None = None
        for attempt in range(self.fetch_retries + 1):
            try:
                return fn()
            except RetryableError as e:
                last = e
                if attempt == self.fetch_retries:
                    break
                self._sleep(self.fetch_interval)
        raise last  # type: ignore[misc]


class HttpBackend:
    """Real-service backend: POSTs prompt batches to an OpenAI-style or
    sutro-style HTTP endpoint from inside the executor task.

    Retry policy mirrors the reference (/root/reference/sutro/sdk.py:103-177):
    idempotent requests retried <=5 times with exponential 1,2,4,... s
    backoff on 524-style timeouts; non-idempotent submissions never
    retried. Requires the ``requests`` package (not baked into this
    container), so construction is gated.
    """

    def __init__(self, base_url: str, api_key: str = "", max_retries: int = 5):
        try:
            import requests  # noqa: F401
        except ImportError as e:  # pragma: no cover - environment-dependent
            raise NotImplementedError(
                "HttpBackend requires the 'requests' package; use StubBackend "
                "in this environment"
            ) from e
        self.base_url = base_url
        self.api_key = api_key
        self.max_retries = max_retries

    def generate(self, prompts, **kw):  # pragma: no cover - needs network
        raise NotImplementedError("network inference not available in this environment")

    def embed(self, prompts, **kw):  # pragma: no cover - needs network
        raise NotImplementedError("network inference not available in this environment")


_REGISTRY: dict[str, Backend] = {"stub": StubBackend()}


def register_backend(name: str, backend: Backend) -> None:
    _REGISTRY[name] = backend


def get_backend(name: str = "stub") -> Backend:
    if name not in _REGISTRY:
        raise ValueError(f"unknown backend {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name]

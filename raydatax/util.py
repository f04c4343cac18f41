"""Small framework utilities (DataX parity).

- :func:`retry` — ``RetryUtil.executeWithRetry`` (``/root/reference/common/
  src/main/java/com/alibaba/datax/common/util/RetryUtil.java:25-44``):
  bounded attempts, fixed-or-exponential sleep.  Used around filesystem /
  manifest operations in the commit path.
- :func:`invoke_hooks` — job-level pre/post handlers + hook invocation with
  final metrics (``JobContainer.java:312-378,971-975``; ``HookInvoker.
  java:28-60``): plain Python callbacks around the driver run.
"""

from __future__ import annotations

import time
from collections.abc import Callable


def retry(
    fn: Callable,
    times: int = 3,
    sleep_s: float = 1.0,
    exponential: bool = True,
    retry_on: tuple[type[BaseException], ...] = (OSError,),
):
    """Run ``fn()`` with up to ``times`` attempts; re-raises the last error."""
    last: BaseException | None = None
    for attempt in range(times):
        try:
            return fn()
        except retry_on as e:  # noqa: PERF203
            last = e
            if attempt + 1 < times:
                time.sleep(sleep_s * (2**attempt if exponential else 1))
    raise last  # type: ignore[misc]


def invoke_hooks(hooks: list[Callable[[dict], None]] | None, report: dict) -> None:
    """Call each hook with the job report; hook errors never fail the job
    (they already committed), they are collected into the report."""
    if not hooks:
        return
    errors = []
    for h in hooks:
        try:
            h(report)
        except Exception as e:  # noqa: BLE001
            errors.append(f"{getattr(h, '__name__', h)}: {e}")
    if errors:
        report.setdefault("hook_errors", []).extend(errors)

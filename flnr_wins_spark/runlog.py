"""S13 — run-log-as-product (reference: StringIO log + SMTP email,
``src/wins_transform_staging.py:81-92,294-319``).

The reference's success criterion is the emailed log: INFO+ records are
accumulated in memory during the run and delivered whether the pipeline
succeeds or fails. Here the same contract: a capturing logger, a pluggable
notifier (SMTP is environment-dependent, so the default notifier is a
callable; ``smtp_notifier`` builds the reference-equivalent one), and a
``logged_run`` wrapper that mirrors the best-effort try/always-deliver shape
of ``wins_staging()``.
"""

from __future__ import annotations

import io
import itertools
import logging
from collections.abc import Callable
from dataclasses import dataclass

_run_counter = itertools.count()


@dataclass
class RunLog:
    logger: logging.Logger
    stream: io.StringIO
    handler: logging.Handler
    _prior_level: int

    def text(self) -> str:
        self.handler.flush()
        return self.stream.getvalue()

    def close(self) -> None:
        self.logger.removeHandler(self.handler)
        self.logger.setLevel(self._prior_level)
        # evict the per-run child logger from logging's manager dict —
        # loggers are retained forever otherwise, an unbounded leak in a
        # long-lived scheduler process that runs logged_run per job
        import logging as _logging

        _logging.Logger.manager.loggerDict.pop(self.logger.name, None)


def capture_log(name: str = "flnr_wins_spark", level: int = logging.INFO) -> RunLog:
    """Capturing logger (``src/wins_transform_staging.py:81-92``): records
    propagate to the parent/root handlers (the console sink), while INFO+ is
    captured to an in-memory stream for delivery. Each run gets its own
    child logger (``<name>.run<N>``) so concurrent runs do not cross-log,
    and ``close()`` restores the logger's prior level."""
    logger = logging.getLogger(f"{name}.run{next(_run_counter)}")
    prior = logger.level
    logger.setLevel(logging.DEBUG)
    stream = io.StringIO()
    handler = logging.StreamHandler(stream)
    handler.setLevel(level)
    handler.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(handler)
    return RunLog(logger=logger, stream=stream, handler=handler, _prior_level=prior)


def smtp_notifier(host: str, sender: str, recipients: list[str], subject: str) -> Callable[[str], None]:
    """Reference-equivalent email delivery (``email_log``,
    ``src/wins_transform_staging.py:294-306``). Built lazily; only touches
    the network when invoked."""

    def send(body: str) -> None:
        import smtplib
        from email.mime.text import MIMEText

        msg = MIMEText(body)
        msg["Subject"], msg["From"], msg["To"] = subject, sender, ", ".join(recipients)
        with smtplib.SMTP(host) as smtp:
            smtp.sendmail(sender, recipients, msg.as_string())

    return send


def logged_run(
    job: Callable[[logging.Logger], None],
    notify: Callable[[str], None] | None = None,
    name: str = "flnr_wins_spark",
) -> tuple[bool, str]:
    """Run ``job`` best-effort: exceptions are logged, not raised, and the
    log is always delivered (``src/wins_transform_staging.py:287-292,308-319``).
    Returns (success, log_text)."""
    run = capture_log(name)
    ok = True
    try:
        run.logger.info("run started")
        job(run.logger)
        run.logger.info("run completed successfully")
    except Exception as exc:  # noqa: BLE001 - reference semantics: log, don't raise
        ok = False
        run.logger.error("run failed: %s", exc, exc_info=True)
    text = ("SUCCESS\n" if ok else "FAILURE\n") + run.text()
    if notify is not None:
        try:
            notify(text)
        except Exception as exc:  # delivery is best-effort too
            run.logger.error("notification failed: %s", exc)
    run.close()
    return ok, text

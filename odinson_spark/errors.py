"""Engine exception type.

Parity: the reference wraps every user-facing failure in
``OdinsonException`` (utils/exceptions/OdinsonException.scala:1-12,
exercised by foundations/TestExceptions.scala:8-20). Here it subclasses
``Exception`` so both ``except OdinsonException`` and ``except Exception``
catch it, mirroring the Scala inheritance checks in that suite.
"""

from __future__ import annotations


class OdinsonException(Exception):
    """Raised for engine-level failures (missing field, bad config, …)."""

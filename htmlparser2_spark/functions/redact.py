"""PII redaction for training-data pipelines — pure Catalyst regexps.

Web text leaks emails, phone numbers, and IP addresses; the standard
pre-training scrub replaces them with stable placeholder tokens so
models neither memorize the PII nor lose the syntactic slot. All three
passes are JVM-side ``regexp_replace`` (codegen-friendly, no UDF), so
the scrub composes with extraction/cleaning selects at full scan speed.

Patterns are deliberately conservative (precision over recall, the
usual choice for corpus scrubbing): RFC-ish emails, international-ish
phone numbers of 7+ digits with separators, and dotted-quad IPv4.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["redact_emails", "redact_phones", "redact_ipv4", "redact_pii"]

_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
# 7+ digits with optional +country and -, space or . separators; word
# boundaries keep plain long numbers (ids, years in ranges) out of it.
_PHONE = r"(?<![\w.])\+?\d{1,3}[-. ]\d{2,4}[-. ]\d{2,4}(?:[-. ]\d{2,4})?(?![\w.])"
_IPV4 = r"(?<![\w.])(?:\d{1,3}\.){3}\d{1,3}(?![\w.])"


def _col(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def redact_emails(text: Column | str, token: str = "[EMAIL]") -> Column:
    return F.regexp_replace(_col(text), _EMAIL, token)


def redact_phones(text: Column | str, token: str = "[PHONE]") -> Column:
    return F.regexp_replace(_col(text), _PHONE, token)


def redact_ipv4(text: Column | str, token: str = "[IP]") -> Column:
    return F.regexp_replace(_col(text), _IPV4, token)


def redact_pii(text: Column | str) -> Column:
    """All three scrubs; email first so its digits can't be half-eaten
    by the phone pass."""
    return redact_ipv4(redact_phones(redact_emails(_col(text))))

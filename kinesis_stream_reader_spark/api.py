"""Engine front door: query-param validation + error envelope.

Pure Python — mirrors the reference's HTTP API contract exactly:
- allowed/required params: app/server/index.js:46-48
- validator: app/server/my_modules/queryTools/index.js:16-62
- error envelopes: app/server/index.js:52-55,65-72 and
  app/server/my_modules/responses/index.js:26-54
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping
from dataclasses import dataclass, field

from .schema import ALLOWED_PARAMS, REQUIRED_PARAMS


@dataclass
class ValidationResult:
    # Shape of the reference's validatedParams IR (queryTools/index.js:2-10).
    badRequest: bool = False
    missingRequiredParams: list[str] = field(default_factory=list)
    invalidParams: list[str] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "badRequest": self.badRequest,
            "missingRequiredParams": self.missingRequiredParams,
            "invalidParams": self.invalidParams,
        }


class QueryParamValidator:
    """queryTools/index.js:16-62 — checks required params present and all
    params within the allowed set."""

    def __init__(
        self,
        allowed: Iterable[str] = ALLOWED_PARAMS,
        required: Iterable[str] = REQUIRED_PARAMS,
    ) -> None:
        self.allowed = set(allowed)
        self.required = list(required)

    def validate_params(self, query: Mapping[str, object]) -> ValidationResult:
        result = ValidationResult()
        for param in self.required:
            if param not in query:
                result.missingRequiredParams.append(param)
        for param in query:
            if param not in self.allowed:
                result.invalidParams.append(param)
        result.badRequest = bool(result.missingRequiredParams or result.invalidParams)
        return result


def error_envelope(message: str) -> dict:
    """Runtime scan failure body (app/server/index.js:66-69)."""
    return {"badRequest": True, "error": message}

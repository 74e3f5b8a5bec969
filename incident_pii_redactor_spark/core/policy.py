"""JSON-configurable scrub policy — C7 parity with the reference's
``src/policies/policy_manager.py`` (DataPattern/PolicyRule/exceptions,
JSON-loadable via ``config/policies/default_policy.json``,
``policy_manager.py:307-340``).

The policy is read-only executor state: at Spark scale it ships once per
worker inside the UDF closure (it is tiny), exactly the broadcast-config
pattern of SURVEY.md §1.2. ``DEFAULT_POLICY`` reproduces the module
constants so behavior without a policy file is unchanged.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from incident_pii_redactor_spark.core import arbitration as _arb


@dataclass(frozen=True)
class Policy:
    """Per-entity-type actions and exceptions.

    * force_redact / default_pseudonymize: override the weighted vote
      (C4 force rules).
    * redaction_tokens: REDACT replacement per type (R3).
    * exceptions: entity_type -> lowercased exact texts that are always
      RETAINed (C7 — reference example: ``support@company.com``).
    """

    force_redact: frozenset = frozenset(_arb.FORCE_REDACT)
    default_pseudonymize: frozenset = frozenset(_arb.DEFAULT_PSEUDONYMIZE)
    redaction_tokens: dict = field(
        default_factory=lambda: dict(_arb.REDACTION_TOKENS)
    )
    default_token: str = _arb.DEFAULT_TOKEN
    exceptions: dict = field(default_factory=dict)

    def is_exception(self, entity_type: str, text: str) -> bool:
        return text.lower() in self.exceptions.get(entity_type, ())

    @classmethod
    def from_dict(cls, d: dict) -> "Policy":
        return cls(
            force_redact=frozenset(d.get("force_redact",
                                         sorted(_arb.FORCE_REDACT))),
            default_pseudonymize=frozenset(
                d.get("default_pseudonymize",
                      sorted(_arb.DEFAULT_PSEUDONYMIZE))
            ),
            redaction_tokens={**_arb.REDACTION_TOKENS,
                              **d.get("redaction_tokens", {})},
            default_token=d.get("default_token", _arb.DEFAULT_TOKEN),
            exceptions={
                k: frozenset(x.lower() for x in v)
                for k, v in d.get("exceptions", {}).items()
            },
        )

    @classmethod
    def from_json(cls, path: str) -> "Policy":
        with open(path) as f:
            return cls.from_dict(json.load(f))


DEFAULT_POLICY = Policy()

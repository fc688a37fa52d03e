from axolotls_spark.plans.audit import (  # noqa: F401
    PlanFacts,
    audit,
    explain_formatted,
)

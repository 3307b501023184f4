"""Sources: fixture generator, table loaders, and the resume ledger."""

from sgb_data_validator_spark.sources.generator import (  # noqa: F401
    FixtureConfig,
    generate_allowed_tools,
    generate_baseline_stats,
    generate_conversations,
    generate_turns,
    write_fixture_tables,
)

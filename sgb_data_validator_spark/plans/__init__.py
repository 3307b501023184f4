"""Plans: assembled validation pipelines, verdicts, and report sinks."""

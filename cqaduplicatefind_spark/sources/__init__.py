"""Sources & sinks: deterministic fixture generation and checkpointed stage tables."""

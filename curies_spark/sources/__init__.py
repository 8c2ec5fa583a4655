"""Sources and sinks: prefix-map loaders/writers, triple I/O, synthetic corpus."""

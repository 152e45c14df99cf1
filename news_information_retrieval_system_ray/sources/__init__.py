"""Sources: synthetic pages corpus + deterministic doc-id-assigning readers."""

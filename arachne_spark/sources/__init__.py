"""Sources: broadcast dictionaries and the synthetic pages corpus."""

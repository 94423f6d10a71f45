"""Query layer: request model, query-language parser, request generator."""

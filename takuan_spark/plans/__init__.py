"""Plan builders: config → DataFrame plans (batch and streaming)."""

"""Config, logging, checkpoint interop, plotting utilities."""

"""End-to-end pipeline composition and configuration."""

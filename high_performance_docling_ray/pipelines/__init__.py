"""End-to-end Dataset pipeline builders."""

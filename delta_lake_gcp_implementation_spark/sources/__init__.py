"""Source connectors (SURVEY.md section 2.1 scans)."""

"""Static-HTML serving surface (the reference's visualization layer).

The reference ships a Streamlit per-student UI (app.py:9-12, 147-191)
and Kibana dashboards over the daily index (README.md:26-27, 43-44).
This package renders the same views as self-contained static HTML —
no server, no JS/CSS dependencies, every number produced by the SAME
registered queries the correctness gate verifies — so the engine's
"analytics and visualization" surface is a build artifact a cron or
`foreachBatch` sink can regenerate per micro-batch, not a resident
service.  See serving/report.py.
"""

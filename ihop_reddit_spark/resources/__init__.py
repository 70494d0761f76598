"""Vendored public data resources (analogy seed pairs, subreddit
collections) — data surfaces the reference bundles under
``ihop/resources/``, restructured as headered CSVs."""

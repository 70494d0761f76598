"""Interactive surface tests: ClusterExplorer semantics vs the
reference Dash callbacks (app.py:362-637) and one full HTTP
select→filter→table round-trip through the stdlib server."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from ihop_reddit_spark.app import ClusterExplorer, make_server


@pytest.fixture(scope="module")
def explorer(spark):
    # three well-separated blobs of "subreddits" → deterministic clusters
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for b, center in enumerate([(0.0, 0.0), (50.0, 0.0), (0.0, 50.0)]):
        for i in range(8):
            x = rng.normal(center, 0.3)
            rows.append((f"sub{b}_{i}", [float(x[0]), float(x[1])]))
    vectors = spark.createDataFrame(rows, "word string, vector array<double>")
    ex = ClusterExplorer(vectors)
    out = ex.train(n_clusters=3, seed=1)
    assert out["name"].startswith("Kmeans")
    assert out["metrics"]["silhouette"] > 0.8
    return ex


def test_untrained_explorer_raises(spark):
    df = spark.createDataFrame([("w", [0.0])], "word string, vector array<double>")
    with pytest.raises(RuntimeError):
        ClusterExplorer(df).selection_table(words=["w"])


def test_selection_table_semantics(explorer):
    base = {
        r["word"]: r["cluster_id"]
        for r in explorer._require_trained().collect()
    }
    # same-blob words share a cluster; cross-blob words don't
    assert base["sub0_0"] == base["sub0_5"]
    assert base["sub0_0"] != base["sub1_0"]

    # words only: exactly the picked rows
    t = explorer.selection_table(words=["sub0_0", "sub1_0"])
    assert sorted(r["word"] for r in t.collect()) == ["sub0_0", "sub1_0"]

    # neighbors: the full clusters of the picked words (2 blobs × 8)
    tn = explorer.selection_table(
        words=["sub0_0", "sub1_0"], show_neighbors=True
    )
    got = sorted(r["word"] for r in tn.collect())
    assert len(got) == 16
    assert all(w.startswith(("sub0_", "sub1_")) for w in got)

    # explicit cluster selection unions in its members, deduplicated
    c2 = base["sub2_0"]
    tc = explorer.selection_table(words=["sub2_3"], clusters=[c2])
    assert sorted(r["word"] for r in tc.collect()) == sorted(
        f"sub2_{i}" for i in range(8)
    )


def test_scatter_highlight_greys_out_unselected(explorer):
    base = {
        r["word"]: r["cluster_id"]
        for r in explorer._require_trained().collect()
    }
    rows = explorer.scatter_data(
        words=["sub0_0"], highlight=True
    ).collect()
    assert len(rows) == 24  # always every point
    keep = base["sub0_0"]
    for r in rows:
        if r["cluster_id"] == keep:
            assert r["display_cluster"] == str(keep)
        else:
            assert r["display_cluster"] == "other"
    # no highlight: every cluster displays as itself
    plain = explorer.scatter_data().collect()
    assert all(
        r["display_cluster"] == str(r["cluster_id"]) for r in plain
    )


def test_recategorize_labels_views(explorer):
    base = {
        r["word"]: r["cluster_id"]
        for r in explorer._require_trained().collect()
    }
    cid = base["sub0_0"]
    explorer.recategorize({cid: "sports"})
    try:
        t = explorer.selection_table(words=["sub0_0", "sub1_0"])
        got = {r["word"]: r["cluster_label"] for r in t.collect()}
        assert got["sub0_0"] == "sports"
        assert got["sub1_0"] == str(base["sub1_0"])
    finally:
        explorer.recategorize({})


@pytest.mark.slow
def test_http_round_trip(explorer):
    """The VERDICT item-4 contract: one select→filter→table round-trip
    driven end-to-end through the HTTP surface."""
    server = make_server(explorer, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}"
            ) as r:
                return json.loads(r.read())

        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        health = get("/health")
        assert health["trained"] is True

        # retrain live (the reference clustering_button)
        out = post("/train", {"n_clusters": 3, "seed": 1})
        assert "silhouette" in out["metrics"]

        # select a word, ask for its cluster neighbors
        table = get("/table?words=sub1_2&neighbors=1")["rows"]
        assert len(table) == 8
        assert {r["word"] for r in table} == {
            f"sub1_{i}" for i in range(8)
        }

        # scatter with highlight keeps all points, greys the rest
        sc = get("/scatter?words=sub1_2&highlight=1")["rows"]
        assert len(sc) == 24
        others = [r for r in sc if r["display_cluster"] == "other"]
        assert len(others) == 16

        # label round-trip
        cid = table[0]["cluster_id"]
        post("/labels", {str(cid): "news"})
        labeled = get("/table?words=sub1_2")["rows"]
        assert labeled[0]["cluster_label"] == "news"
        post("/labels", {})
    finally:
        server.shutdown()
        server.server_close()


def test_scatter_html_page_highlight_flow(explorer):
    """VERDICT r4 item 4: the rendered scatter page. Selecting a
    cluster via the legend-link URL greys every other point; the plain
    page shows no grey — the reference app's select→highlight flow."""
    server = make_server(explorer, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}"
            ) as r:
                return r.headers["Content-Type"], r.read().decode()

        ctype, page = get("/scatter.html")
        assert ctype == "text/html"
        assert page.count("<circle") == 24
        assert 'fill="#cccccc"' not in page  # no highlight → no grey
        # legend links drive the select→highlight flow
        assert 'href="/scatter.html?clusters=' in page
        # per-point tooltips carry the word names
        assert "<title>sub0_0 (cluster" in page

        base = {
            r["word"]: r["cluster_id"]
            for r in explorer._require_trained().collect()
        }
        cid = base["sub1_0"]
        _, hl = get(f"/scatter.html?clusters={cid}&highlight=1")
        assert hl.count("<circle") == 24  # every point still drawn
        assert hl.count('fill="#cccccc"') == 16  # two blobs greyed
        # the selected cluster keeps its palette color on 8 points
        colored = [
            ln for ln in hl.split("<circle")[1:]
            if f'data-cluster="{cid}"' in ln and "#cccccc" not in ln
        ]
        assert len(colored) == 8
        # toggling highlight off restores full color
        _, off = get(f"/scatter.html?clusters={cid}")
        assert 'fill="#cccccc"' not in off
        # "/" serves the same page
        _, root = get("/")
        assert root.count("<circle") == 24
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.slow
def test_tsne_projection_option(spark, explorer):
    """The reference app plots t-SNE coordinates; train(projection=
    'tsne') must produce the same assignment frame shape."""
    out = explorer.train(n_clusters=3, seed=1, projection="tsne")
    assert "silhouette" in out["metrics"]
    rows = explorer.scatter_data().collect()
    assert len(rows) == 24
    assert all(r["x"] is not None and r["y"] is not None for r in rows)
    # restore the module-fixture state for any later test
    explorer.train(n_clusters=3, seed=1)


def test_http_csv_export(explorer):
    import threading
    import urllib.request

    from ihop_reddit_spark.app import make_server

    server = make_server(explorer, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/export.csv"
        ) as r:
            assert r.headers["Content-Type"] == "text/csv"
            lines = r.read().decode().strip().splitlines()
        assert lines[0].startswith("word,")
        assert len(lines) == 25  # header + 24 points
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.slow
def test_collection_selection(spark):
    """The reference app's TODO shipped: selecting a named collection
    pulls every member present in the vocabulary into the table."""
    from ihop_reddit_spark.resources.collections import (
        get_collection_members,
    )

    name = "Denigrating toward immigrants"
    members = get_collection_members(name)
    rows = [(m, [float(i), 0.0]) for i, m in enumerate(members[:6])]
    rows += [("unrelated", [99.0, 99.0])]
    vectors = spark.createDataFrame(
        rows, "word string, vector array<double>"
    )
    ex = ClusterExplorer(vectors)
    ex.train(n_clusters=2, seed=1)
    got = sorted(
        r["word"] for r in ex.selection_table(collection=name).collect()
    )
    assert got == sorted(m for m, _ in rows[:6])
    # unknown collection name raises (KeyError via the loader)
    with pytest.raises(KeyError):
        ex.selection_table(collection="nope")

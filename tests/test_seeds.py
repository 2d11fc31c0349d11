"""Seed-file parser unit tests (O2): dual format, tolerant skip,
member-suffix strip (Task2.java:52-93, SilhouetteEvaluation2.java:65)."""

from __future__ import annotations

from mapreduce_kmeans_clustering_spark.sources.seeds import Centroid, load_seeds


def _write(tmp_path, name, content):
    p = tmp_path / name
    p.write_text(content)
    return str(p)


def test_csv_format_ids_are_line_indices(tmp_path):
    path = _write(tmp_path, "seeds.csv", "1,2,3\n4,5,6\n")
    assert load_seeds(path) == [Centroid(0, 1, 2, 3), Centroid(1, 4, 5, 6)]


def test_tsv_format_ids_from_key(tmp_path):
    path = _write(tmp_path, "seeds.tsv", "3\t1.5,2.5,3.5\n0\t4,5,6\n")
    assert load_seeds(path) == [Centroid(3, 1.5, 2.5, 3.5), Centroid(0, 4, 5, 6)]


def test_member_list_suffix_stripped(tmp_path):
    path = _write(tmp_path, "m.tsv", "2\t1.0,2.0,3.0; 9,9,9; 8,8,8\n")
    assert load_seeds(path) == [Centroid(2, 1.0, 2.0, 3.0)]


def test_malformed_lines_skipped(tmp_path, capsys):
    path = _write(
        tmp_path,
        "bad.csv",
        "1,2,3\n\nnot,a,number\n4,5\n7,8,9\n",
    )
    seeds = load_seeds(path)
    # valid lines get consecutive ids (post-skip indexing)
    assert seeds == [Centroid(0, 1, 2, 3), Centroid(1, 7, 8, 9)]
    assert "skipping malformed" in capsys.readouterr().err


def test_mixed_tab_and_garbage(tmp_path):
    path = _write(tmp_path, "mix.tsv", "0\t1,2,3\njunk\tline\n1\t4,5,6\n")
    assert load_seeds(path) == [Centroid(0, 1, 2, 3), Centroid(1, 4, 5, 6)]

"""Object-store FileManager backend against an in-memory fake client:
prefix fan-out, dry runs, move = copy+delete, and the archive-restore flow."""

import pytest

from lakehouse_engine_spark import manage_files


class FakeStore:
    """In-memory S3-compatible client implementing the protocol in
    core/object_store.py. Restore states advance one step per status poll
    so the wait loop is exercised without sleeping."""

    def __init__(self, objects):
        self.objects = dict(objects)  # (bucket, key) -> bytes
        self.restore_state = {}
        self.calls = []

    def list_objects(self, bucket, prefix):
        return sorted(k for (b, k) in self.objects if b == bucket and k.startswith(prefix))

    def delete_objects(self, bucket, keys):
        self.calls.append(("delete", bucket, tuple(keys)))
        for k in keys:
            self.objects.pop((bucket, k), None)

    def copy_object(self, sb, sk, db, dk):
        self.calls.append(("copy", sb, sk, db, dk))
        self.objects[(db, dk)] = self.objects[(sb, sk)]

    def restore_object(self, bucket, key, days, tier):
        self.calls.append(("restore", bucket, key, days, tier))
        self.restore_state[(bucket, key)] = "not_started"

    def restore_status(self, bucket, key):
        state = self.restore_state.get((bucket, key), "not_started")
        nxt = {"not_started": "ongoing", "ongoing": "restored", "restored": "restored"}
        self.restore_state[(bucket, key)] = nxt[state]
        return state


@pytest.fixture()
def store():
    return FakeStore(
        {
            ("b", "data/part-0.parquet"): b"p0",
            ("b", "data/part-1.parquet"): b"p1",
            ("b", "other/one.txt"): b"o",
        }
    )


def test_delete_prefix_fans_out(store):
    manage_files(
        {"function": "delete_objects", "bucket": "b", "object_paths": ["data/"]},
        client=store,
    )
    assert set(store.objects) == {("b", "other/one.txt")}


def test_delete_dry_run_lists_without_deleting(store):
    plan = manage_files(
        {"function": "delete_objects", "bucket": "b", "object_paths": ["data/"],
         "dry_run": True},
        client=store,
    )
    assert plan == {"b": ["data/part-0.parquet", "data/part-1.parquet"]}
    assert len(store.objects) == 3


def test_copy_directory_preserves_suffixes(store):
    manage_files(
        {"function": "copy_objects", "bucket": "b", "source_object": "data/",
         "destination_bucket": "b2", "destination_object": "backup/"},
        client=store,
    )
    assert ("b2", "backup/part-0.parquet") in store.objects
    assert ("b2", "backup/part-1.parquet") in store.objects
    assert ("b", "data/part-0.parquet") in store.objects  # copy keeps source


def test_move_single_object(store):
    manage_files(
        {"function": "move_objects", "bucket": "b", "source_object": "other/one.txt",
         "destination_object": "moved/one.txt"},
        client=store,
    )
    assert ("b", "moved/one.txt") in store.objects
    assert ("b", "other/one.txt") not in store.objects


def test_move_into_nested_destination_keeps_copies(store):
    """Destination nested under the source prefix: the delete must cover
    exactly the keys the copy plan read, never a fresh prefix expansion
    (which would match — and destroy — the freshly copied objects)."""
    manage_files(
        {"function": "move_objects", "bucket": "b", "source_object": "data/",
         "destination_object": "data/archive/"},
        client=store,
    )
    assert ("b", "data/archive/part-0.parquet") in store.objects
    assert ("b", "data/archive/part-1.parquet") in store.objects
    assert ("b", "data/part-0.parquet") not in store.objects
    assert ("b", "data/part-1.parquet") not in store.objects
    deletes = [c for c in store.calls if c[0] == "delete"]
    assert deletes == [("delete", "b", ("data/part-0.parquet", "data/part-1.parquet"))]


def test_move_does_not_delete_keys_added_during_copy(store):
    """A key created under the source prefix between copy and delete was
    never copied, so it must survive the move."""
    class RacingStore(FakeStore):
        def copy_object(self, sb, sk, db, dk):
            super().copy_object(sb, sk, db, dk)
            # concurrent writer lands a new object mid-move
            self.objects.setdefault(("b", "data/late.parquet"), b"late")

    racing = RacingStore(
        {("b", "data/part-0.parquet"): b"p0"}
    )
    manage_files(
        {"function": "move_objects", "bucket": "b", "source_object": "data/",
         "destination_object": "moved/"},
        client=racing,
    )
    assert ("b", "data/late.parquet") in racing.objects
    assert ("b", "moved/part-0.parquet") in racing.objects
    assert ("b", "data/part-0.parquet") not in racing.objects


def test_restore_to_destination_and_wait(store):
    manage_files(
        {"function": "request_restore_to_destination_and_wait", "bucket": "b",
         "source_object": "data/", "destination_object": "restored/",
         "restore_expiration": 3, "retrieval_tier": "Standard",
         "poll_interval_seconds": 0},
        client=store,
    )
    restores = [c for c in store.calls if c[0] == "restore"]
    assert restores == [
        ("restore", "b", "data/part-0.parquet", 3, "Standard"),
        ("restore", "b", "data/part-1.parquet", 3, "Standard"),
    ]
    assert ("b", "restored/part-0.parquet") in store.objects


def test_check_restore_status_counts(store):
    store.restore_state = {
        ("b", "data/part-0.parquet"): "restored",
        ("b", "data/part-1.parquet"): "ongoing",
    }
    counts = manage_files(
        {"function": "check_restore_status", "bucket": "b", "source_object": "data/"},
        client=store,
    )
    assert counts == {
        "not_started_objects": 0, "ongoing_objects": 1, "restored_objects": 1,
        "total_objects": 2,
    }


def test_unknown_function_raises(store):
    with pytest.raises(ValueError, match="unknown function"):
        manage_files({"function": "nope", "bucket": "b"}, client=store)

"""Shared helper for the media-codec tests: pixel-array -> the
rows-of-(r,g,b)-tuples convention every encode_* test-support function
takes (hoisted from per-file copies, review r15 #6)."""


def px_rows(arr):
    return [
        [tuple(int(c) for c in arr[y, x]) for x in range(arr.shape[1])]
        for y in range(arr.shape[0])
    ]

#!/usr/bin/env python
"""Summarize a jax.profiler xplane trace: top XLA ops / op categories.

Dependency-free ``.xplane.pb`` reader (hand-rolled protobuf walk — the
tensorboard profile plugin is not installed in this image).  Reads the
device plane, aggregates the synchronous "XLA Ops" line (the actual
serialized device timeline; the "Async XLA Ops" line overlaps compute and
would double-count), and prints per-op and per-category totals.

Usage:
    python tools/misc/profile_top_ops.py TRACE.xplane.pb [--steps N] [--top K]

``--steps`` divides totals by the number of profiled steps so numbers read
as ms/step.  Capture traces with
``mmdet3d_gaussian_tpu.engine.profiling.trace`` or
``tools/train.py --profile-steps``; the file lands under
``<logdir>/plugins/profile/<ts>/*.xplane.pb``.

The reference has no profiler at all (SURVEY.md §5); this plus
``engine/profiling.py`` is the TPU build's tracing subsystem.
"""
from __future__ import annotations

import argparse
import re
from collections import defaultdict


def read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = read_varint(buf, pos)
        elif wt == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f'wire type {wt}')
        yield fnum, wt, val


def parse_event(buf):
    mid = dur = 0
    for f, _, v in fields(buf):
        if f == 1:
            mid = v
        elif f == 3:
            dur = v
    return mid, dur


def parse_line(buf):
    name = ''
    events = []
    for f, _, v in fields(buf):
        if f == 2:
            name = v.decode('utf-8', 'replace')
        elif f == 4:
            events.append(parse_event(v))
    return name, events


def parse_meta_entry(buf):
    key = 0
    name = ''
    for f, _, v in fields(buf):
        if f == 1:
            key = v
        elif f == 2:
            for f2, _, v2 in fields(v):
                if f2 == 2:
                    name = v2.decode('utf-8', 'replace')
    return key, name


def parse_plane(buf):
    name = ''
    lines = []
    meta = {}
    for f, _, v in fields(buf):
        if f == 2:
            name = v.decode('utf-8', 'replace')
        elif f == 3:
            lines.append(parse_line(v))
        elif f == 4:
            k, nm = parse_meta_entry(v)
            meta[k] = nm
    return name, lines, meta


def main():
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('trace', help='path to *.xplane.pb')
    ap.add_argument('--steps', type=int, default=1,
                    help='profiled step count (divides totals)')
    ap.add_argument('--top', type=int, default=25)
    args = ap.parse_args()

    data = open(args.trace, 'rb').read()
    for f, _, v in fields(data):
        if f != 1:
            continue
        pname, lines, meta = parse_plane(v)
        if 'TPU' not in pname and 'CPU' not in pname.upper():
            continue
        per_op = defaultdict(float)
        per_cat = defaultdict(float)
        cnt = defaultdict(int)
        for lname, events in lines:
            if lname != 'XLA Ops':
                continue
            for mid, dur in events:
                name = meta.get(mid, str(mid))
                ms = dur / 1e9
                per_op[name] += ms
                m = re.match(r'%?([a-zA-Z_\-]+)', name)
                cat = m.group(1) if m else '?'
                per_cat[cat] += ms
                cnt[cat] += 1
        if not per_op:
            continue
        total = sum(per_op.values()) / args.steps
        print(f'== {pname}: {total:.3f} ms/step over {args.steps} step(s)')
        print('-- categories --')
        for cat, ms in sorted(per_cat.items(), key=lambda kv: -kv[1])[:args.top]:
            print(f'{ms / args.steps:9.3f} ms x{cnt[cat] // args.steps:5d}  '
                  f'{cat}')
        print('-- top ops --')
        for name, ms in sorted(per_op.items(),
                               key=lambda kv: -kv[1])[:args.top]:
            print(f'{ms / args.steps:9.3f} ms  {name[:140]}')


if __name__ == '__main__':
    main()

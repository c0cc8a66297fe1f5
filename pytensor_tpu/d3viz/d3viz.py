"""Interactive HTML graph visualization.

Parallels /root/reference/pytensor/d3viz/ (d3viz:43): writes a
self-contained HTML page rendering the Apply graph as an interactive
force-directed diagram (vis-network via CDN; falls back to a static
<pre> debugprint when offline rendering is needed).
"""

from __future__ import annotations

import html
import json
from pathlib import Path

from pytensor_tpu.graph.basic import Apply, Constant, Variable
from pytensor_tpu.graph.fg import FunctionGraph
from pytensor_tpu.graph.traversal import applys_between

_TEMPLATE = """<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8"/>
<title>pytensor_tpu graph</title>
<script src="https://unpkg.com/vis-network/standalone/umd/vis-network.min.js"></script>
<style>
  #net {{ width: 100%; height: 90vh; border: 1px solid #ccc; }}
  body {{ font-family: sans-serif; }}
</style>
</head>
<body>
<h3>pytensor_tpu graph</h3>
<div id="net"></div>
<pre id="fallback" style="display:none">{fallback}</pre>
<script>
  const nodes = new vis.DataSet({nodes});
  const edges = new vis.DataSet({edges});
  const container = document.getElementById("net");
  new vis.Network(container, {{nodes, edges}}, {{
    layout: {{hierarchical: {{direction: "UD", sortMethod: "directed"}}}},
    physics: false,
    nodes: {{shape: "box", font: {{size: 12}}}},
    edges: {{arrows: "to"}},
  }});
</script>
</body>
</html>
"""


def _graph_json(graph_like):
    if isinstance(graph_like, FunctionGraph):
        outputs = graph_like.outputs
    elif isinstance(graph_like, Variable):
        outputs = [graph_like]
    elif hasattr(graph_like, "fgraph"):
        outputs = graph_like.fgraph.outputs
    else:
        outputs = list(graph_like)
    nodes = []
    edges = []
    ids: dict[int, int] = {}

    def nid(obj, label, kind):
        if id(obj) not in ids:
            ids[id(obj)] = len(ids)
            color = {"apply": "#97c2fc", "input": "#7be141",
                     "const": "#ffd27f", "output": "#fb7e81"}[kind]
            nodes.append({"id": ids[id(obj)], "label": label[:40],
                          "color": color})
        return ids[id(obj)]

    for node in applys_between([], outputs):
        an = nid(node, str(node.op), "apply")
        for i in node.inputs:
            kind = "const" if isinstance(i, Constant) else (
                "input" if i.owner is None else "apply"
            )
            src = nid(i.owner, str(i.owner.op), "apply") if i.owner is not None \
                else nid(i, str(i), kind)
            edges.append({"from": src, "to": an})
    for k, o in enumerate(outputs):
        on = nid(("out", k), f"output {k}", "output")
        src = nid(o.owner, str(o.owner.op), "apply") if o.owner is not None \
            else nid(o, str(o), "input")
        edges.append({"from": src, "to": on})
    return nodes, edges


def d3write(graph_like, outfile):
    from pytensor_tpu.printing import debugprint

    nodes, edges = _graph_json(graph_like)
    fallback = html.escape(debugprint(graph_like, file="str"))
    Path(outfile).write_text(
        _TEMPLATE.format(nodes=json.dumps(nodes), edges=json.dumps(edges),
                         fallback=fallback)
    )
    return outfile


def d3viz(graph_like, outfile, copy_deps=True, *args, **kwargs):
    """Write an interactive HTML visualization of a graph to ``outfile``."""
    return d3write(graph_like, outfile)

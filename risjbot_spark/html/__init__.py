"""Pure-stdlib lenient HTML DOM + mini-XPath selector engine.

The container has no lxml, so the extraction layer (which must run both
inside vectorized pandas UDFs and standalone as the pytest oracle) uses this
module. The node model follows lxml's text/tail convention so selector
semantics (``//text()`` document order, ``remove()`` dropping the tail —
the behavior the reference relies on via ``node.getparent().remove(node)``,
see /root/reference/RISJbot/utils.py:9-41) carry over unchanged.
"""

from .dom import Node, parse_html
from .select import xpath, remove_nodes, remove_nodes_batch, string_value

__all__ = ["Node", "parse_html", "xpath", "remove_nodes",
           "remove_nodes_batch", "string_value"]

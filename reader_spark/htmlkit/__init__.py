from .dom import Node, parse_html
from .selectors import matches, query_all

__all__ = ["Node", "parse_html", "matches", "query_all"]

from sql_graph_visualizer_spark.api.resolvers import GraphQueryResolver

__all__ = ["GraphQueryResolver"]

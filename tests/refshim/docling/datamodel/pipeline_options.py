class LayoutOptions:
    def __init__(self, keep_empty_clusters: bool = False,
                 create_orphan_clusters: bool = True) -> None:
        self.keep_empty_clusters = keep_empty_clusters
        self.create_orphan_clusters = create_orphan_clusters

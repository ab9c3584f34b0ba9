PREFIX : <http://x/>
INSERT { ?s :p ?o } WITH :g WHERE { ?s :q ?o }

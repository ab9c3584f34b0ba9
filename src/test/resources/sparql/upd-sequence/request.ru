PREFIX : <http://x/>
INSERT DATA { <http://x/a> <http://x/p> <http://x/b> } ;
DELETE { ?s :p ?o } INSERT { ?s :r ?o } WHERE { ?s :p ?o }

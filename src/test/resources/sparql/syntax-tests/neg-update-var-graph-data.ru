PREFIX : <http://x/>
INSERT DATA { GRAPH ?g { <http://x/s> :p 1 } }
